"""Tile tuning with chained dependent matmuls (defeats dispatch elision)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, D = 29952, 41472, 64
CHAIN = 8


def chain_time(one_mm, b, x, n=6):
    """Time CHAIN dependent matmuls inside one jit; return ms per matmul."""

    @jax.jit
    def f(b, x):
        def body(i, x):
            y = one_mm(b, x)  # (M, D)
            # feed output back as next input (pad M -> K)
            return jnp.concatenate([y, jnp.zeros((K - M, D), y.dtype)], axis=0) * 1e-3

        return jax.lax.fori_loop(0, CHAIN, body, x)

    jax.block_until_ready(f(b, x))
    t0 = time.time()
    for _ in range(n):
        out = f(b, x)
    jax.block_until_ready(out)
    return (time.time() - t0) / n / CHAIN


def make_pallas(tm, tk):
    def kernel(b_ref, x_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += jnp.dot(
            b_ref[:].astype(jnp.bfloat16), x_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

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
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * K * D, bytes_accessed=M * K + K * D * 2 + M * D * 4,
                transcendentals=0,
            ),
        )(b, x)

    return f


def main():
    rng = np.random.default_rng(0)
    b_np = (rng.random((M, K)) < 0.001).astype(np.float32)
    b8 = jnp.asarray(b_np.astype(np.int8))
    b16 = jnp.asarray(b_np.astype(jnp.bfloat16))
    x = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))

    t = chain_time(
        lambda b, x: jnp.dot(b, x.astype(jnp.bfloat16), preferred_element_type=jnp.float32),
        b16, x,
    )
    print(f"XLA bf16:             {t*1e3:7.2f} ms/mm  ({M*K*2/t/1e9:6.0f} GB/s)")

    t = chain_time(
        lambda b, x: jnp.dot(b.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32),
        b8, x,
    )
    print(f"XLA int8+convert:     {t*1e3:7.2f} ms/mm  ({M*K/t/1e9:6.0f} GB/s)")

    for tm, tk in [(256, 512), (512, 512), (1024, 512), (2048, 512), (512, 256), (1024, 1024)]:
        try:
            f = make_pallas(tm, tk)
            t = chain_time(f, b8, x)
            print(f"pallas int8 {tm:4d}x{tk:4d}: {t*1e3:7.2f} ms/mm  ({M*K/t/1e9:6.0f} GB/s)")
        except Exception as e:
            print(f"pallas int8 {tm}x{tk}: FAILED {str(e)[:100]}")


if __name__ == "__main__":
    main()
