"""Persistent XLA compilation cache.

The reference never compiles anything at run time; this framework's jitted
steps/evals do, and on the remote-TPU ('axon') platform a first compile costs
minutes. JAX's persistent compilation cache serializes compiled executables
to disk keyed by (HLO, compile options, backend), so a process re-running an
already-seen shape loads instead of recompiling — this is what makes

  * the serving story's FIRST refresh at a (bucketed) catalog shape cheap in
    a fresh process (VERDICT r4 next #1), and
  * the pcache engine's cold start survivable across runs (next #4).

Call ``enable_persistent_cache()`` once, before the first jit dispatch. Every
entry point does (cli/main.py, bench.py, serve.Recommender, tools/*). Opt out
with IGCN_COMPILE_CACHE=off.
"""

from __future__ import annotations

import os

_ENABLED = False

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "igcn_cf_tpu", "xla_cache"
)


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Idempotent. Returns the cache dir, or None if disabled/unavailable."""
    global _ENABLED
    env = os.environ.get("IGCN_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "disable", "disabled"):
        return None
    cache_dir = cache_dir or env or DEFAULT_DIR
    if _ENABLED:
        return cache_dir
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that takes real compile time; the default 1 GiB
        # min-entry gate would skip every program in this workload
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:
        return None  # old jax or read-only FS: cache is an optimization only
    _ENABLED = True
    return cache_dir
