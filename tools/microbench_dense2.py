"""Dense bipartite SpMM refinements: int8 storage (fused convert?),
transpose-free second half, int4."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from igcn_cf_tpu.data.synthetic import synthetic_interactions

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
    B = np.zeros((nu, ni), dtype=np.float32)
    B[ds.train_array[:, 0], ds.train_array[:, 1]] = 1.0
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.normal(size=(ni, D)).astype(np.float32))
    xu = jnp.asarray(rng.normal(size=(nu, D)).astype(np.float32))

    B16 = jnp.asarray(B.astype(jnp.bfloat16))
    B8 = jnp.asarray(B.astype(jnp.int8))

    f = jax.jit(lambda B16, xi: jnp.dot(B16, xi.astype(jnp.bfloat16),
                                        preferred_element_type=jnp.float32))
    t = timeit(f, B16, xi)
    ref = np.asarray(f(B16, xi))
    print(f"bf16 B @ x:             {t*1e3:7.2f} ms")

    f8 = jax.jit(lambda B8, xi: jnp.dot(B8.astype(jnp.bfloat16),
                                        xi.astype(jnp.bfloat16),
                                        preferred_element_type=jnp.float32))
    t = timeit(f8, B8, xi)
    err = np.abs(np.asarray(f8(B8, xi)) - ref).max()
    print(f"int8->bf16 B @ x:       {t*1e3:7.2f} ms   (err {err:.1e})")

    # transpose-free: einsum contracting the user axis of the same buffer
    ft = jax.jit(lambda B16, xu: jnp.einsum(
        "ui,ud->id", B16, xu.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32))
    t = timeit(ft, B16, xu)
    print(f"bf16 B^T-free @ xu:     {t*1e3:7.2f} ms")

    ft8 = jax.jit(lambda B8, xu: jnp.einsum(
        "ui,ud->id", B8.astype(jnp.bfloat16), xu.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32))
    t = timeit(ft8, B8, xu)
    print(f"int8 B^T-free @ xu:     {t*1e3:7.2f} ms")

    try:
        B4 = jnp.asarray(B.astype(np.int8)).astype(jnp.int4)
        f4 = jax.jit(lambda B4, xi: jnp.dot(B4.astype(jnp.bfloat16),
                                            xi.astype(jnp.bfloat16),
                                            preferred_element_type=jnp.float32))
        t = timeit(f4, B4, xi)
        err = np.abs(np.asarray(f4(B4, xi)) - ref).max()
        print(f"int4->bf16 B @ x:       {t*1e3:7.2f} ms   (err {err:.1e})")
    except Exception as e:
        print("int4 failed:", str(e)[:120])


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
