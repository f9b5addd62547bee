"""Forward pcache kernel: whole-slab dot_general variant.

The bwd_one finding (tools/microbench_bwd2.py: 9.4 -> 2.0 ms by replacing
the per-column-tile dot loop with ONE dot_general per grid step) suggests the
same for the forward: contract the full 3-D slab (tr, sub, lanes) against the
matching X0 block reshaped (sub, lanes, d) with TWO contracting dims, instead
of 144 (tr,128)x(128,d) dots. Baseline: fwd = 2.64 ms at (nj=4, tr=128).
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

from igcn_cf_tpu.kernels.pcache import _fused_fwd

N = 70839
NPAD = 73728
R = 6144
D = 64
HBM_GBPS = 819.0


def loop_time(step, *args, lo=6, hi=26):
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


def _dma(p_hbm, slab, sems, rows_ref, slot, i, j, r, tr):
    return pltpu.make_async_copy(
        p_hbm.at[pl.ds(rows_ref[i * tr + r], 1), j],
        slab.at[slot, pl.ds(r, 1)],
        sems.at[slot, r],
    )


def fwd_one(p4, rows, x0b3, *, tr, vmem_mb=100):
    """x0b3 is (nj, sub, lanes, d) bf16 — X0 pre-reshaped into slab layout."""
    n, nj, sub, lanes = p4.shape
    npad = nj * sub * lanes
    d = x0b3.shape[3]
    r_tot = rows.shape[0]
    ni = r_tot // tr
    nsteps = ni * nj

    def kernel(rows_ref, p_hbm, x0_ref, out_ref, slab, acc, sems):
        i, j = pl.program_id(0), pl.program_id(1)
        step = i * nj + j
        slot = jax.lax.rem(step, 2)
        nstep = step + 1
        nslot = jax.lax.rem(nstep, 2)
        ni_, nj_ = jax.lax.div(nstep, nj), jax.lax.rem(nstep, nj)

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

        # (tr, sub, lanes) x (1, sub, lanes, d) contracting (sub, lanes)
        part = jax.lax.dot_general(
            slab[slot], x0_ref[0],
            dimension_numbers=(((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tr, d)

        @pl.when(j == 0)
        def _():
            acc[:] = part

        @pl.when(j > 0)
        def _():
            acc[:] = acc[:] + part

        @pl.when(j == nj - 1)
        def _():
            out_ref[:] = acc[:]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ni, nj),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, sub, lanes, d),
                             lambda i, j, rows_ref: (j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tr, d), lambda i, j, rows_ref: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tr, sub, lanes), jnp.bfloat16),
                pltpu.VMEM((tr, d), jnp.float32),
                pltpu.SemaphoreType.DMA((2, tr)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((r_tot, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_tot * npad * d,
            bytes_accessed=r_tot * npad * 2 + npad * d * 2 + r_tot * d * 4,
            transcendentals=0,
        ),
    )(rows, p4, x0b3)


def correctness():
    n, nj, sub, d, tr = 700, 2, 8, 32, 64
    r_tot = 3 * tr
    rng = np.random.default_rng(0)
    p4 = jnp.asarray(rng.standard_normal((n, nj, sub, 128))).astype(jnp.bfloat16)
    rows = jnp.asarray(rng.integers(0, n, size=r_tot).astype(np.int32))
    npad = nj * sub * 128
    x0 = jnp.asarray(rng.standard_normal((npad, d))).astype(jnp.bfloat16)
    want = jnp.dot(p4.reshape(n, npad)[rows], x0,
                   preferred_element_type=jnp.float32)
    x0b3 = x0.reshape(nj, sub, 128, d)
    got = fwd_one(p4, rows, x0b3, tr=tr)
    err = float(jnp.abs(got - want).max() / (jnp.abs(want).max() + 1e-9))
    print(f"fwd_one correctness: {err:.2e}", flush=True)


def main():
    correctness()
    key = jax.random.PRNGKey(0)
    kp, kr, kx = jax.random.split(key, 3)
    rows = jax.random.randint(kr, (R,), 0, N, dtype=jnp.int32)
    x0b = jax.random.normal(kx, (NPAD, D), dtype=jnp.float32).astype(jnp.bfloat16)
    row_bytes = R * NPAD * 2
    flops = 2 * R * NPAD * D

    for nj in (4, 8):
        p4 = jax.random.normal(
            kp, (N, nj, NPAD // nj // 128, 128), dtype=jnp.bfloat16
        )
        x0b3 = x0b.reshape(nj, NPAD // nj // 128, 128, D)
        try:
            t = loop_time(
                lambda s, pa, ra, xa: _fused_fwd(
                    pa, ra + smin(s), xa, tr=128
                )[0, 0] * 1e-20,
                p4, rows, x0b,
            )
            print(f"prod fwd nj={nj} tr=128: {t:8.3f} ms  "
                  f"{row_bytes/1e9/(t/1e3):6.1f} GB/s", flush=True)
        except Exception as e:
            print(f"prod fwd nj={nj}: {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
        try:
            t = loop_time(
                lambda s, pa, ra, xa: fwd_one(
                    pa, ra + smin(s), xa, tr=128
                )[0, 0] * 1e-20,
                p4, rows, x0b3,
            )
            print(f"fwd_one  nj={nj} tr=128: {t:8.3f} ms  "
                  f"{row_bytes/1e9/(t/1e3):6.1f} GB/s", flush=True)
        except Exception as e:
            print(f"fwd_one nj={nj}: {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
        del p4

    print(f"roofline: {row_bytes/1e9/HBM_GBPS*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
