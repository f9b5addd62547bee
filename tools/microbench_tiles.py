"""Tune binary-matmul kernel tiles at Gowalla scale vs XLA bf16 matmul."""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, D = 29952, 41472, 64  # padded Gowalla


def timeit(fn, *args, n=30):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def make_pallas(tm, tk, dsem):
    def kernel(b_ref, x_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += jnp.dot(
            b_ref[:].astype(jnp.bfloat16), x_ref[:],
            preferred_element_type=jnp.float32,
        )

    @jax.jit
    def f(b, x):
        return pl.pallas_call(
            kernel,
            grid=(M // tm, K // tk),
            in_specs=[
                pl.BlockSpec((tm, tk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((tk, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=dsem,
            ) if dsem else None,
            cost_estimate=pl.CostEstimate(
                flops=2 * M * K * D, bytes_accessed=M * K + K * D * 2 + M * D * 4,
                transcendentals=0,
            ),
        )(b, x.astype(jnp.bfloat16))

    return f


def main():
    rng = np.random.default_rng(0)
    b_np = (rng.random((M, K)) < 0.001).astype(np.float32)
    b8 = jnp.asarray(b_np.astype(np.int8))
    b16 = jnp.asarray(b_np.astype(jnp.bfloat16))
    x = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))

    f_xla = jax.jit(lambda b, x: jnp.dot(b, x.astype(jnp.bfloat16),
                                         preferred_element_type=jnp.float32))
    t = timeit(f_xla, b16, x)
    print(f"XLA bf16:              {t*1e3:7.2f} ms  ({M*K*2/t/1e9:6.0f} GB/s)")

    for tm, tk in [(256, 512), (512, 512), (512, 1024), (1024, 512), (256, 1024), (1024, 1024)]:
        try:
            f = make_pallas(tm, tk, ("parallel", "arbitrary"))
            t = timeit(f, b8, x)
            err = np.abs(np.asarray(f(b8, x)) - np.asarray(f_xla(b16, x))).max()
            print(f"pallas int8 {tm}x{tk}:   {t*1e3:7.2f} ms  ({M*K/t/1e9:6.0f} GB/s)  err {err:.1e}")
        except Exception as e:
            print(f"pallas int8 {tm}x{tk}: FAILED {str(e)[:80]}")


if __name__ == "__main__":
    main()
