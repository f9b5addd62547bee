"""Fused retrieval kernel microbench at Gowalla scale: full-catalog masked
top-20 for all 29,858 users in ONE kernel (kernels/retrieval.py) vs the
round-4 scan path's measured ~565 ms scan+topk piece (tools/bench_eval.py).

Run: python tools/microbench_retrieval.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from igcn_cf_tpu.kernels.retrieval import (
    BU, LI, NEG, fused_topk_ids, pack_exclusion_words,
)
from igcn_cf_tpu.utils.timing import scan_ms, smin0

N_USERS, N_ITEMS, D, K = 29858, 40981, 64, 20


def _pad_to(n, m):
    return -(-n // m) * m


def main():
    nup, nip = _pad_to(N_USERS, BU), _pad_to(N_ITEMS, LI)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    ku, ki = jax.random.split(key)
    ur = jax.random.normal(ku, (nup, D), jnp.float32)
    it = jax.random.normal(ki, (D, nip), jnp.float32)

    # realistic exclusion density: ~28 train items per user
    t0 = time.time()
    excl = [
        rng.choice(N_ITEMS, size=rng.integers(5, 60), replace=False)
        for _ in range(N_USERS)
    ] + [[] for _ in range(nup - N_USERS)]
    words_np = pack_exclusion_words(excl, nup, N_ITEMS, nip)
    print(f"pack_exclusion_words: {time.time()-t0:.2f}s "
          f"({words_np.nbytes/1e6:.0f} MB)", flush=True)
    words = jnp.asarray(words_np)
    banned = np.zeros((1, nip), np.float32)
    banned[0, N_ITEMS:] = NEG
    banned = jnp.asarray(banned)

    def step(s, ura, ita, wa, ba):
        u = ura + s * 1e-30
        ids = fused_topk_ids(u, ita, wa, ba, k=K)
        return s + ids[0, 0].astype(jnp.float32) * 1e-20

    ms = scan_ms(step, ur, it, words, banned)
    print(f"fused retrieval (all {N_USERS} users, top-{K}): {ms:.2f} ms "
          f"= {N_USERS / ms * 1e3:,.0f} users/s device-side", flush=True)

    # spot correctness vs masked lax.top_k on one user block
    sc = (ur[:BU] @ it).at[:, N_ITEMS:].set(NEG)
    rows = []
    for u in range(BU):
        s_u = np.array(sc[u])
        s_u[np.asarray(excl[u], dtype=np.int64)] = NEG
        rows.append(s_u)
    sc_np = np.stack(rows)
    want = np.argsort(-sc_np, axis=1, kind="stable")[:, :K]
    got = np.asarray(
        fused_topk_ids(ur, it, words, banned, k=K)
    )[:BU]
    print(f"block-0 exact match: {(got == want).all()}", flush=True)


if __name__ == "__main__" and "--sweep" not in sys.argv:
    main()


def sweep():
    """BU/LI geometry sweep of the fused kernel."""
    from igcn_cf_tpu.utils.timing import scan_ms

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    ku, ki = jax.random.split(key)
    cases = ((256, 4096), (512, 4096), (1024, 4096), (512, 8192),
             (1024, 8192), (256, 8192))
    pick = [a for a in sys.argv[1:] if "x" in a]
    if pick:
        cases = [tuple(int(v) for v in p.split("x")) for p in pick]
    for bu, li in cases:
        nup, nip = _pad_to(N_USERS, bu), _pad_to(N_ITEMS, li)
        ur = jax.random.normal(ku, (nup, D), jnp.float32)
        it = jax.random.normal(ki, (D, nip), jnp.float32)
        words = jnp.zeros((nup, nip // 32), jnp.uint32)
        banned = np.zeros((1, nip), np.float32)
        banned[0, N_ITEMS:] = NEG
        banned = jnp.asarray(banned)

        def step(s, ura, ita, wa, ba, bu=bu, li=li):
            u = ura + s * 1e-30
            ids = fused_topk_ids(u, ita, wa, ba, k=K, bu=bu, li=li)
            return s + ids[0, 0].astype(jnp.float32) * 1e-20

        try:
            ms = scan_ms(step, ur, it, words, banned)
            print(f"bu={bu:5d} li={li:5d}: {ms:7.2f} ms "
                  f"({N_USERS/ms*1e3:,.0f} users/s)", flush=True)
        except Exception as e:
            print(f"bu={bu} li={li}: {type(e).__name__}: {str(e)[:90]}",
                  flush=True)


if __name__ == "__main__" and "--sweep" in sys.argv:
    sweep()
