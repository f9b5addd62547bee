"""Decompose SpMM cost on TPU: gather vs segment-sum vs scatter vs cumsum."""

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
from igcn_cf_tpu.kernels.sparse import SparseGraph

D = 64


def timeit(fn, *args, n=20):
    jax.block_until_ready(fn(*args))
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
    nnz = coo.nnz
    print(f"nodes {n}, nnz {nnz}, bytes gathered {nnz*D*4/1e6:.0f} MB")
    g = SparseGraph.from_coo(coo)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, D)).astype(np.float32))
    e = g.vals.shape[0]
    pre = jnp.asarray(rng.normal(size=(e, D)).astype(np.float32))

    t = timeit(jax.jit(lambda x: x[g.cols]), x)
    print(f"pure gather (E,64):        {t*1e3:8.2f} ms  ({e*D*4/t/1e9:6.1f} GB/s)")

    t = timeit(jax.jit(lambda x: x[g.cols] * g.vals[:, None]), x)
    print(f"gather+scale:              {t*1e3:8.2f} ms")

    t = timeit(
        jax.jit(
            lambda p: jax.ops.segment_sum(
                p, g.rows, num_segments=g.n_rows, indices_are_sorted=True
            )
        ),
        pre,
    )
    print(f"segment_sum on pre-gather: {t*1e3:8.2f} ms")

    t = timeit(
        jax.jit(
            lambda p: jax.ops.segment_sum(p, g.rows, num_segments=g.n_rows)
        ),
        pre,
    )
    print(f"segment_sum (unsorted fl): {t*1e3:8.2f} ms")

    t = timeit(jax.jit(lambda p: jnp.zeros((g.n_rows, D)).at[g.rows].add(p)), pre)
    print(f"scatter-add:               {t*1e3:8.2f} ms")

    # cumsum-diff sorted segment sum: out[r] = cs[end_r] - cs[start_r]
    indptr = np.zeros(n + 1, dtype=np.int32)
    np.add.at(indptr, np.asarray(g.rows) + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    indptr_j = jnp.asarray(indptr)

    def cumsum_seg(p):
        cs = jnp.cumsum(p, axis=0)
        cs = jnp.concatenate([jnp.zeros((1, D), p.dtype), cs], axis=0)
        return cs[indptr_j[1:]] - cs[indptr_j[:-1]]

    t = timeit(jax.jit(cumsum_seg), pre)
    print(f"cumsum-diff seg sum:       {t*1e3:8.2f} ms")

    # correctness of cumsum-diff vs segment_sum
    a = np.asarray(
        jax.ops.segment_sum(pre, g.rows, num_segments=g.n_rows, indices_are_sorted=True)
    )
    b = np.asarray(cumsum_seg(pre))
    print("cumsum-diff max err:", np.abs(a - b).max())

    # bf16 variants
    x16 = x.astype(jnp.bfloat16)
    t = timeit(jax.jit(lambda x: x[g.cols]), x16)
    print(f"pure gather bf16:          {t*1e3:8.2f} ms")
    pre16 = pre.astype(jnp.bfloat16)
    t = timeit(
        jax.jit(
            lambda p: jax.ops.segment_sum(
                p, g.rows, num_segments=g.n_rows, indices_are_sorted=True
            )
        ),
        pre16,
    )
    print(f"segment_sum bf16:          {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
