"""Eval top-k sweep: flat lax.top_k vs exact two-stage chunked top-k on the
(B, n_items) masked score matrix (round-4 eval item: scan+topk at 238 ms vs
a ~13 ms score-matmul floor — top_k dominates the single-dispatch eval).

Two-stage is EXACT: every global top-k element is in the top-k of its chunk;
stage 2 re-ranks the C*k candidates. Run: python tools/microbench_topk.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 512
N_ITEMS = 40981
K = 20
NB = 59  # scan blocks per eval at 29858 users


def loop_time(step, *args, lo=4, hi=12):
    @jax.jit
    def f(n, *a):
        return jax.lax.fori_loop(0, n, lambda i, s: step(s, *a), jnp.float32(0.0))

    def timed(n):
        t0 = time.time()
        out = f(jnp.int32(n), *args)
        float(out)
        return time.time() - t0

    timed(2)
    tlo, thi = timed(lo), timed(hi)
    return (thi - tlo) / (hi - lo) * 1e3


def smin(s):
    return jnp.minimum(s.astype(jnp.int32), 0)


def flat_topk(scores, k):
    _, items = jax.lax.top_k(scores, k)
    return items


def two_stage_topk(scores, k, chunk):
    b, n = scores.shape
    c = -(-n // chunk)
    pad = c * chunk - n
    if pad:
        scores = jnp.concatenate(
            [scores, jnp.full((b, pad), -jnp.inf, scores.dtype)], axis=1
        )
    v = scores.reshape(b, c, chunk)
    cv, ci = jax.lax.top_k(v, k)  # (b, c, k)
    base = (jnp.arange(c, dtype=jnp.int32) * chunk)[None, :, None]
    cand_idx = (ci + base).reshape(b, c * k)
    cand_val = cv.reshape(b, c * k)
    _, sel = jax.lax.top_k(cand_val, k)
    return jnp.take_along_axis(cand_idx, sel, axis=1)


def main():
    key = jax.random.PRNGKey(0)
    scores = jax.random.normal(key, (B, N_ITEMS), jnp.float32)

    # correctness
    want = np.asarray(flat_topk(scores, K))
    for chunk in (512, 1024, 2048, 4096):
        got = np.asarray(two_stage_topk(scores, K, chunk))
        ok = (got == want).all()
        print(f"two_stage chunk={chunk}: exact_match={bool(ok)}", flush=True)

    def scan_eval(topk_fn):
        def step(s, sc):
            def body(c, i):
                items = topk_fn(sc + smin(s))
                return c + items[0, 0], items[0, 0]

            out, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(NB))
            return s + out.astype(jnp.float32) * 1e-20

        return step

    t = loop_time(scan_eval(lambda sc: flat_topk(sc, K)), scores)
    print(f"flat lax.top_k      x{NB}: {t:8.1f} ms/eval", flush=True)
    for chunk in (512, 1024, 2048, 4096):
        t = loop_time(scan_eval(lambda sc, ch=chunk: two_stage_topk(sc, K, ch)),
                      scores)
        print(f"two_stage chunk={chunk:4d} x{NB}: {t:8.1f} ms/eval", flush=True)


if __name__ == "__main__":
    main()
