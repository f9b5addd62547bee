"""Microbenchmark SpMM formulations on the current backend (TPU by default).

Times, at Gowalla scale (~71k nodes, ~1.7M undirected edges, d=64):
  1. COO gather + sorted segment_sum           (current kernel) — fwd and vjp
  2. same but custom-vjp via the transpose     (no XLA scatter in backward)
  3. ELL bucketed gather (padded neighbor rows, pure gather+reduce) — fwd/vjp

Run: python tools/microbench_spmm.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from igcn_cf_tpu.data.synthetic import synthetic_interactions
from igcn_cf_tpu.graph.build import sym_norm_adjacency
from igcn_cf_tpu.kernels.sparse import SparseGraph, spmm

D = 64


def timeit(fn, *args, n=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    print("backend:", jax.devices()[0].platform)
    ds = synthetic_interactions(n_users=29858 // 4, n_items=40981 // 4, avg_degree=34, seed=1)
    coo = sym_norm_adjacency(ds.train_array, ds.n_users, ds.n_items)
    n = coo.shape[0]
    print(f"nodes {n}, nnz {coo.nnz}")
    g = SparseGraph.from_coo(coo)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, D)).astype(np.float32))

    # 1. segment-sum fwd
    f1 = jax.jit(lambda x: spmm(g, x))
    t = timeit(f1, x)
    print(f"segment_sum fwd:          {t*1e3:8.2f} ms  ({coo.nnz*D*2/t/1e9:7.1f} GFLOP/s)")

    # 1b. fwd+bwd via autodiff (scatter in backward)
    f2 = jax.jit(jax.grad(lambda x: jnp.sum(spmm(g, x) ** 2)))
    t = timeit(f2, x)
    print(f"segment_sum fwd+bwd(AD):  {t*1e3:8.2f} ms")

    # 2. custom vjp using symmetry (A == A^T): backward = forward spmm
    @jax.custom_vjp
    def spmm_sym(x):
        return spmm(g, x)

    def fwd(x):
        return spmm(g, x), None

    def bwd(_, ct):
        return (spmm(g, ct),)

    spmm_sym.defvjp(fwd, bwd)
    f3 = jax.jit(jax.grad(lambda x: jnp.sum(spmm_sym(x) ** 2)))
    t = timeit(f3, x)
    print(f"segment_sum fwd+bwd(sym): {t*1e3:8.2f} ms")

    # 3. ELL: pad per-row neighbor lists to max degree (bucketless, one block)
    deg = np.bincount(np.asarray(coo.rows), minlength=n)
    max_deg = int(deg.max())
    mean_deg = deg.mean()
    print(f"max_deg {max_deg}, mean {mean_deg:.1f}, ELL pad waste {max_deg/mean_deg:.1f}x")
    nbr = np.zeros((n, max_deg), dtype=np.int32)
    w = np.zeros((n, max_deg), dtype=np.float32)
    pos = np.zeros(n, dtype=np.int64)
    for r, c, v in zip(np.asarray(coo.rows), np.asarray(coo.cols), np.asarray(coo.vals)):
        nbr[r, pos[r]] = c
        w[r, pos[r]] = v
        pos[r] += 1
    nbr_j, w_j = jnp.asarray(nbr), jnp.asarray(w)

    def ell(x):
        return jnp.einsum("re,red->rd", w_j, x[nbr_j])

    f4 = jax.jit(ell)
    t = timeit(f4, x)
    print(f"ELL fwd:                  {t*1e3:8.2f} ms")

    @jax.custom_vjp
    def ell_sym(x):
        return ell(x)

    ell_sym.defvjp(lambda x: (ell(x), None), lambda _, ct: (ell(ct),))
    f5 = jax.jit(jax.grad(lambda x: jnp.sum(ell_sym(x) ** 2)))
    t = timeit(f5, x)
    print(f"ELL fwd+bwd(sym):         {t*1e3:8.2f} ms")

    # correctness cross-check
    np.testing.assert_allclose(
        np.asarray(f1(x)), np.asarray(f4(x)), rtol=2e-3, atol=2e-3
    )
    print("ELL == segment_sum ✓")


if __name__ == "__main__":
    main()
