"""Measure Mosaic's tpu.dynamic_gather throughput (sublane gather).

The sparse SpMM design (ELL tiles gathered from VMEM-resident source blocks)
is viable iff take_along_axis-style gathers run at vector-op speed, not as a
per-row loop. This kernel does G dependent gathers of an (N, 128) f32 block
with arbitrary sublane indices and reports ns and cycles/row.

Timing uses the traced-count fori_loop + D2H readback protocol
(KERNEL_FINDINGS.md docstring: axon's block_until_ready lies).
"""

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


def make_gather_kernel(n_rows: int, reps: int):
    def kernel(idx_ref, x_ref, out_ref):
        def body(i, acc):
            # make indices iteration-dependent so the loop can't be hoisted
            idx = (idx_ref[:] + i) % n_rows
            g = jnp.take_along_axis(x_ref[:], idx, axis=0)
            return acc + g

        out_ref[:] = jax.lax.fori_loop(
            0, reps, body, jnp.zeros_like(out_ref)
        )

    return kernel


def gather_chain(n_rows: int, reps: int, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_rows, 128)).astype(np.float32)).astype(dtype)
    idx = jnp.asarray(
        rng.integers(0, n_rows, size=(n_rows, 128)).astype(np.int32)
    )

    call = pl.pallas_call(
        make_gather_kernel(n_rows, reps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, 128), dtype),
    )

    @jax.jit
    def f(idx, x, n):
        def body(i, x):
            return call(idx, x) * 1e-3

        return jax.lax.fori_loop(0, n, body, x)

    def timed(n):
        t0 = time.time()
        out = f(idx, x, jnp.int32(n))
        _ = float(out[0, 0])
        return time.time() - t0

    timed(2)
    tlo, thi = timed(5), timed(25)
    per_call = (thi - tlo) / 20  # seconds per pallas_call (reps gathers)
    per_gather = per_call / reps
    rows_per_s = n_rows / per_gather
    cycles_per_row = per_gather * 0.94e9 / n_rows
    print(
        f"N={n_rows:6d} dtype={dtype.__name__:9s}: {per_gather*1e6:8.2f} us/gather "
        f"({rows_per_s/1e9:6.2f} Grows/s, {cycles_per_row:6.2f} cyc/row)",
        flush=True,
    )


def main():
    for n in (512, 2048, 8192):
        gather_chain(n, reps=50)
    gather_chain(2048, reps=50, dtype=jnp.bfloat16)


if __name__ == "__main__":
    main()
