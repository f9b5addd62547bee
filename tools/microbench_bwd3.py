"""Pcache BACKWARD sweep #3: apply the round-4 forward finding (in-kernel
``slab.reshape(tr, tkc)`` is near-free and unlocks one flat 2-D dot at
~45 TF/s / 710 GB/s — tools/microbench_fwd3.py) to the backward.

  bwd_one   — production round-3 kernel: 3-D dot (d,tr)x(tr,sub,lanes),
              4-D output reshaped outside (2.03 ms).
  bwd_resh  — ct^T (d, tr) @ slab.reshape(tr, tkc) -> (d, tkc) flat 2-D
              output block accumulated in VMEM; no 4-D output, no outside
              moveaxis.

Run: python tools/microbench_bwd3.py
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

from tools.microbench_bwd2 import bwd_one, to2d_one, loop_time, smin, _dma

N = 70839
NPAD = 73728
R = 6144
D = 64
HBM_GBPS = 819.0


def bwd_resh(p4, rows, ctb, *, tr, vmem_mb=100):
    n, nj, sub, lanes = p4.shape
    tkc = sub * lanes
    npad = nj * tkc
    d = ctb.shape[1]
    r_tot = ctb.shape[0]
    ni = r_tot // tr
    nsteps = nj * ni

    def kernel(rows_ref, p_hbm, ct_ref, out_ref, slab, sems):
        j, i = pl.program_id(0), pl.program_id(1)
        step = j * ni + i
        slot = jax.lax.rem(step, 2)
        nstep = step + 1
        nslot = jax.lax.rem(nstep, 2)
        nj_, ni_ = jax.lax.div(nstep, ni), jax.lax.rem(nstep, ni)

        @pl.when(step == 0)
        def _():
            for r in range(tr):
                _dma(p_hbm, slab, sems, rows_ref, 0, i, j, r, tr).start()

        @pl.when(nstep < nsteps)
        def _():
            for r in range(tr):
                _dma(p_hbm, slab, sems, rows_ref, nslot, ni_, nj_, r, tr).start()

        for r in range(tr):
            _dma(p_hbm, slab, sems, rows_ref, slot, i, j, r, tr).wait()

        ct_t = ct_ref[:].T  # (d, tr)
        part = jnp.dot(ct_t, slab[slot].reshape(tr, tkc),
                       preferred_element_type=jnp.float32)  # (d, tkc)

        @pl.when(i == 0)
        def _():
            out_ref[:] = part

        @pl.when(i > 0)
        def _():
            out_ref[:] = out_ref[:] + part

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nj, ni),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tr, d), lambda j, i, rows_ref: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((d, tkc), lambda j, i, rows_ref: (0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tr, sub, lanes), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, tr)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((d, npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_tot * npad * d,
            bytes_accessed=r_tot * npad * 2 + r_tot * d * 2 + npad * d * 4,
            transcendentals=0,
        ),
    )(rows, p4, ctb)


def report(name, ms, nbytes, flops=0):
    line = f"{name:40s} {ms:8.3f} ms   {nbytes / 1e9 / (ms / 1e3):7.1f} GB/s"
    if flops:
        line += f"   {flops / (ms / 1e3) / 1e12:6.1f} TF/s"
    print(line, flush=True)


def correctness():
    n, nj, sub, d, tr = 700, 2, 16, 32, 64
    r_tot = 3 * tr
    rng = np.random.default_rng(0)
    p4 = jnp.asarray(rng.standard_normal((n, nj, sub, 128))).astype(jnp.bfloat16)
    rows = jnp.asarray(rng.integers(0, n, size=r_tot).astype(np.int32))
    ctb = jnp.asarray(rng.standard_normal((r_tot, d))).astype(jnp.bfloat16)
    npad = nj * sub * 128
    g = p4.reshape(n, npad)[rows]
    want = jax.lax.dot_general(
        g, ctb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    got = bwd_resh(p4, rows, ctb, tr=tr).T
    err = float(jnp.abs(got - want).max() / (jnp.abs(want).max() + 1e-9))
    print(f"bwd_resh: relerr {err:.2e}", flush=True)


def main():
    correctness()
    key = jax.random.PRNGKey(0)
    kp, kr, kc = jax.random.split(key, 3)
    rows = jax.random.randint(kr, (R,), 0, N, dtype=jnp.int32)
    ctb = jax.random.normal(kc, (R, D), dtype=jnp.float32).astype(jnp.bfloat16)
    row_bytes = R * NPAD * 2
    flops = 2 * R * NPAD * D

    for nj in (4, 8):
        p4 = jax.random.normal(
            kp, (N, nj, NPAD // nj // 128, 128), dtype=jnp.bfloat16
        )
        for name, fn, post in (
            ("bwd_one", bwd_one, lambda o: to2d_one(o).ravel()[0]),
            ("bwd_resh", bwd_resh, lambda o: o.ravel()[0]),
        ):
            try:
                t = loop_time(
                    lambda s, pa, ra, ca: post(
                        fn(pa, ra + smin(s), ca, tr=128)
                    ) * 1e-20,
                    p4, rows, ctb,
                )
                report(f"{name} nj={nj} tr=128", t, row_bytes, flops)
            except Exception as e:
                print(f"{name} nj={nj}: {type(e).__name__}: {str(e)[:110]}",
                      flush=True)
        del p4

    print(
        f"roofline: {row_bytes/1e9:.2f} GB/pass = "
        f"{row_bytes/1e9/HBM_GBPS*1e3:.2f} ms @ {HBM_GBPS:.0f} GB/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
