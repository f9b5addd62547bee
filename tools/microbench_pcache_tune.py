"""Tune the fused pcache gather+matmul kernels: fwd/bwd variants x (NJ, TR).

Round-3 findings this tool explores:
  * fwd (NJ=4, TR=128) measured 2.66 ms vs 1.11 ms roofline — candidates:
    resident (constant-index) X0 block to kill the per-step refetch, fewer
    DMA starts via NJ=2.
  * bwd dim0-contraction measured 9.45 ms — Mosaic inserts a transpose per
    (128,128) sub-tile. Variant 2 computes dX0^T = ct^T @ slab with ONE ct
    transpose per grid step and standard MXU dots, transposing the (npad, d)
    result once outside the kernel.

Timing: traced-count fori_loop + readback differencing; all device arrays
passed as jit ARGS (never closures — axon remote-compile stalls on multi-GB
constants).
"""

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

N = 70839
NPAD = 73728  # 4096-aligned
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


def report(name, ms, nbytes, flops=0):
    line = f"{name:46s} {ms:8.3f} ms   {nbytes / 1e9 / (ms / 1e3):7.1f} GB/s"
    if flops:
        line += f"   {flops / (ms / 1e3) / 1e12:6.1f} TF/s"
    print(line, flush=True)


def smin(s):
    return jnp.minimum(s.astype(jnp.int32), 0)


def _dma(p_hbm, slab, sems, rows_ref, slot, i, j, r, tr):
    return pltpu.make_async_copy(
        p_hbm.at[pl.ds(rows_ref[i * tr + r], 1), j],
        slab.at[slot, pl.ds(r, 1)],
        sems.at[slot, r],
    )


def fwd(p4, rows, x0b, *, tr, resident_x0):
    n, nj, sub, lanes = p4.shape
    tkc = sub * lanes
    npad = nj * tkc
    d = x0b.shape[1]
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

        part = jnp.zeros((tr, d), jnp.float32)
        for c in range(sub):
            x_blk = (
                x0_ref[pl.ds(j * tkc + c * lanes, lanes), :]
                if resident_x0
                else x0_ref[pl.ds(c * lanes, lanes), :]
            )
            part += jnp.dot(
                slab[slot, :, c, :], x_blk, preferred_element_type=jnp.float32
            )

        @pl.when(j == 0)
        def _():
            acc[:] = part

        @pl.when(j > 0)
        def _():
            acc[:] = acc[:] + part

        @pl.when(j == nj - 1)
        def _():
            out_ref[:] = acc[:]

    x0_spec = (
        pl.BlockSpec((npad, d), lambda i, j, rows_ref: (0, 0),
                     memory_space=pltpu.VMEM)
        if resident_x0
        else pl.BlockSpec((tkc, d), lambda i, j, rows_ref: (j, 0),
                          memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ni, nj),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), x0_spec],
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
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_tot * npad * d,
            bytes_accessed=r_tot * npad * 2 + npad * d * 2 + r_tot * d * 4,
            transcendentals=0,
        ),
    )(rows, p4, x0b)


def bwd_t(p4, rows, ctb, *, tr):
    """dX0^T = ct^T @ P4[rows]: one ct transpose per step, standard dots,
    (d, npad) output (caller transposes once)."""
    n, nj, sub, lanes = p4.shape
    tkc = sub * lanes
    npad = nj * tkc
    d = ctb.shape[1]
    r_tot = rows.shape[0]
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

        ct_t = ct_ref[:].T  # (d, tr) — ONE transpose per grid step

        for c in range(sub):
            part = jnp.dot(
                ct_t, slab[slot, :, c, :], preferred_element_type=jnp.float32
            )  # (d, lanes)

            @pl.when(i == 0)
            def _():
                out_ref[:, pl.ds(c * lanes, lanes)] = part

            @pl.when(i > 0)
            def _():
                out_ref[:, pl.ds(c * lanes, lanes)] = (
                    out_ref[:, pl.ds(c * lanes, lanes)] + part
                )

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
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_tot * npad * d,
            bytes_accessed=r_tot * npad * 2 + r_tot * d * 2 + npad * d * 4,
            transcendentals=0,
        ),
    )(rows, p4, ctb)


def correctness():
    n, nj, sub, d, tr = 700, 2, 8, 32, 64
    r_tot = 3 * tr
    tkc = sub * 128
    npad = nj * tkc
    rng = np.random.default_rng(0)
    p4 = jnp.asarray(rng.standard_normal((n, nj, sub, 128))).astype(jnp.bfloat16)
    rows = jnp.asarray(rng.integers(0, n, size=r_tot).astype(np.int32))
    x0b = jnp.asarray(rng.standard_normal((npad, d))).astype(jnp.bfloat16)
    ctb = jnp.asarray(rng.standard_normal((r_tot, d))).astype(jnp.bfloat16)
    g = p4.reshape(n, npad)[rows]
    want_f = jnp.dot(g, x0b, preferred_element_type=jnp.float32)
    want_b = jax.lax.dot_general(
        g, ctb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    def relerr(a, b):
        return float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))

    for res in (False, True):
        got = fwd(p4, rows, x0b, tr=tr, resident_x0=res)
        print(f"  fwd resident={res}: {relerr(got, want_f):.2e}", flush=True)
    got = bwd_t(p4, rows, ctb, tr=tr).T
    print(f"  bwd_t: {relerr(got, want_b):.2e}", flush=True)


def main():
    print("correctness (small):", flush=True)
    correctness()

    key = jax.random.PRNGKey(0)
    kp, kr, kx, kc = jax.random.split(key, 4)
    rows = jax.random.randint(kr, (R,), 0, N, dtype=jnp.int32)
    x0b = jax.random.normal(kx, (NPAD, D), dtype=jnp.float32).astype(jnp.bfloat16)
    ctb = jax.random.normal(kc, (R, D), dtype=jnp.float32).astype(jnp.bfloat16)
    row_bytes = R * NPAD * 2
    flops = 2 * R * NPAD * D

    print("\ntiming (Gowalla scale):", flush=True)
    for nj in (4, 2):
        p4 = jax.random.normal(
            kp, (N, nj, NPAD // nj // 128, 128), dtype=jnp.bfloat16
        )
        for tr, res in ((128, False), (64, False), (64, True), (32, True)):
            slab_mb = 2 * tr * (NPAD // nj) * 2 / 1e6
            x0_mb = (NPAD if res else NPAD // nj) * D * 2 / 1e6
            if slab_mb + x0_mb > 15.0:
                continue
            try:
                t = loop_time(
                    lambda s, pa, ra, xa: fwd(
                        pa, ra + smin(s), xa, tr=tr, resident_x0=res
                    )[0, 0] * 1e-20,
                    p4, rows, x0b,
                )
                report(f"fwd nj={nj} tr={tr} resident={int(res)}", t,
                       row_bytes, flops)
            except Exception as e:
                print(f"fwd nj={nj} tr={tr} res={int(res)}: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        for tr in (128, 64, 32):
            slab_mb = 2 * tr * (NPAD // nj) * 2 / 1e6
            if slab_mb + D * (NPAD // nj) * 4 / 1e6 > 15.0:
                continue
            try:
                t = loop_time(
                    lambda s, pa, ra, ca: bwd_t(
                        pa, ra + smin(s), ca, tr=tr
                    )[0, 0] * 1e-20,
                    p4, rows, ctb,
                )
                report(f"bwd_t nj={nj} tr={tr}", t, row_bytes, flops)
            except Exception as e:
                print(f"bwd_t nj={nj} tr={tr}: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        del p4

    print(
        f"\nroofline: {row_bytes/1e9:.2f} GB/pass = "
        f"{row_bytes/1e9/HBM_GBPS*1e3:.2f} ms @ {HBM_GBPS:.0f} GB/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
