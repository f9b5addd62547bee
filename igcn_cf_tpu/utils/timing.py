"""Scan-based device timing.

On the 'axon' TPU platform ``jax.block_until_ready`` does not actually block
(round-2 finding: a 10 GB reduction "completes" in 0.1 ms), so wall-clock
around a single dispatch measures nothing. All on-device timing in this repo
therefore runs the step under a traced-count ``lax.fori_loop`` and differences
two readbacks: ms/step = (t(hi) - t(lo)) / (hi - lo). The D2H readback of the
scalar carry is the only reliable synchronization point.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def scan_ms(step: Callable, *args, lo: int = 4, hi: int = 16) -> float:
    """ms per call of ``step(carry_scalar, *args) -> carry_scalar``.

    ``step`` MUST thread the float32 scalar carry into its computation (e.g.
    perturb an input by ``carry * 1e-30`` or index by ``min(carry, 0)``) so
    iterations cannot be hoisted out of the loop, and must fold its output
    into the returned scalar so nothing is dead-code-eliminated.

    Device arrays the step reads must be passed via ``*args`` — NOT closed
    over. A closed-over array becomes a constant embedded in the compiled
    program, and on the axon platform multi-GB constants stall the remote
    compile transport indefinitely (round-3 finding; same rule as
    train/bpr.py's samplers-as-arguments).
    """

    @jax.jit
    def f(n, *a):
        return jax.lax.fori_loop(
            0, n, lambda i, s: step(s, *a), jnp.float32(0.0)
        )

    def timed(n: int) -> float:
        t0 = time.time()
        out = f(jnp.int32(n), *args)
        float(out)  # D2H readback = the sync point
        return time.time() - t0

    timed(2)  # compile + warmup
    tlo, thi = timed(lo), timed(hi)
    return max(0.0, (thi - tlo) / (hi - lo) * 1e3)


def smin0(s: jnp.ndarray) -> jnp.ndarray:
    """min(carry, 0) as int32 — always 0 at runtime but traced, so adding it
    to indices makes them loop-carried without changing them."""
    return jnp.minimum(s.astype(jnp.int32), 0)
