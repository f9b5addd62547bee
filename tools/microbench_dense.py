"""Validate the dense-bipartite SpMM formulation on TPU.

sym_norm_adjacency @ X  ==  [ du*(B @ (di*X_i)) ; di*(B^T @ (du*X_u)) ]
with B the binary (n_users, n_items) interaction matrix — a dense MXU matmul
with rank-1 scaling instead of a serial gather/scatter loop."""

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


def timeit(fn, *args, n=50):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main(scale=4):
    print("backend:", jax.devices()[0].platform)
    ds = synthetic_interactions(
        n_users=29858 // scale, n_items=40981 // scale, avg_degree=34, seed=1
    )
    nu, ni = ds.n_users, ds.n_items
    coo = sym_norm_adjacency(ds.train_array, nu, ni)
    g = SparseGraph.from_coo(coo)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(nu + ni, D)).astype(np.float32))

    # dense binary halves
    B = np.zeros((nu, ni), dtype=np.float32)
    B[ds.train_array[:, 0], ds.train_array[:, 1]] = 1.0
    deg_u = np.maximum(B.sum(1), 1.0) ** -0.5
    deg_i = np.maximum(B.sum(0), 1.0) ** -0.5
    B16 = jnp.asarray(B.astype(jnp.bfloat16))
    BT16 = jnp.asarray(B.T.astype(jnp.bfloat16))
    du = jnp.asarray(deg_u.astype(np.float32))
    di = jnp.asarray(deg_i.astype(np.float32))
    print(f"B {nu}x{ni}, nnz {len(ds)}, density {len(ds)/(nu*ni):.2e}, "
          f"bf16 {nu*ni*2/1e6:.0f} MB/half")

    def dense_prop(B16, BT16, du, di, x):
        xu, xi = x[:nu], x[nu:]
        yu = du[:, None] * jnp.dot(
            B16, (di[:, None] * xi).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        yi = di[:, None] * jnp.dot(
            BT16, (du[:, None] * xu).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return jnp.concatenate([yu, yi], axis=0)

    f_sparse = jax.jit(lambda g, x: spmm(g, x))
    f_dense = jax.jit(dense_prop)

    a = np.asarray(f_sparse(g, x))
    b = np.asarray(f_dense(B16, BT16, du, di, x))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print("dense vs sparse rel err:", err)

    t = timeit(f_sparse, g, x)
    print(f"sparse segsum SpMM: {t*1e3:8.2f} ms")
    t = timeit(f_dense, B16, BT16, du, di, x)
    print(f"dense bf16 SpMM:    {t*1e3:8.2f} ms  "
          f"({2*nu*ni*2/t/1e9:6.0f} GB/s eff, {2*nu*ni*D*2/t/1e12:5.1f} TFLOP/s)")

    # fwd+bwd
    f_sg = jax.jit(jax.grad(lambda x: jnp.sum(spmm(g, x) ** 2)))
    f_dg = jax.jit(
        lambda B16, BT16, du, di, x: jax.grad(
            lambda x: jnp.sum(dense_prop(B16, BT16, du, di, x) ** 2)
        )(x)
    )
    t = timeit(f_sg, x)
    print(f"sparse fwd+bwd:     {t*1e3:8.2f} ms")
    t = timeit(f_dg, B16, BT16, du, di, x)
    print(f"dense fwd+bwd:      {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
