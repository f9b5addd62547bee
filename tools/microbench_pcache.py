"""Decompose the pcache train-step hot path and prototype Pallas replacements.

Round-2 finding (VERDICT): gather_rows + gathered_prop fwd+bwd costs ~39.5 ms
per step against a ~3 ms HBM roofline (passes over the 871 MB gathered row
block).  This bench isolates WHERE the time goes and measures candidate
kernels at exact Gowalla-pcache scale:

  A   XLA row gather  G = P[rows]            (the current gather_rows)
  B   XLA fwd dot     Y = G @ X0             (on pre-gathered G)
  C   XLA bwd         dX0 = G^T @ ct         (dim0-contraction)
  D   current fwd+bwd (gather + custom-vjp dot) end to end
  F4  Pallas FUSED fwd, P stored (N, NJ, TKC/128, 128) -> contiguous row DMAs
      (Mosaic cannot DMA-slice a single row of a 2D T(8,128)-tiled memref --
      "Slice shape along dimension 0 must be aligned to tiling (8)" -- so P
      is stored with the row dim outermost-untiled and each (row, col-block)
      a contiguous (TKC/128, 128) tile slab)
  G4  Pallas FUSED bwd, 4D

All fused kernels stream TR=128 gathered rows per grid step through a
double-buffered VMEM slab (manual async DMAs from HBM) straight into the MXU.

Timing: axon's block_until_ready does not wait (round-2 finding), so all
numbers use traced-count fori_loop + scalar D2H readback differencing.

Shapes: n = 70,839 (Gowalla users+items), n_pad = 71,680 (512-aligned),
R = 3*2048 = 6,144 gathered rows, d = 64.  P is bf16: 10.15 GB in HBM.
Roofline (v5e, ~819 GB/s HBM): one pass over the gathered rows = R*n_pad*2B
= 881 MB = 1.08 ms; fwd+bwd = 2 passes = 2.15 ms.
"""

from __future__ import annotations

import gc
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 70839
NPAD = 73728  # NJ*128*8 = 4096-aligned: per-row DMA slabs of the (8,128)-
# tiled 4D memref must have sub = NPAD/NJ/128 divisible by 8
R = 6144
D = 64
TR = 128
NJ = 4

HBM_GBPS = 819.0


def loop_time(step, *args, lo=6, hi=26):
    """ms per call via traced-count fori_loop + D2H readback differencing.
    Device arrays MUST be passed via *args, not closed over: closed-over
    arrays embed as constants and stall axon's remote-compile transport
    (round-3 finding — the round-2 version of this script hung here)."""

    @jax.jit
    def f(n, *a):
        return jax.lax.fori_loop(
            0, n, lambda i, s: step(s, *a), jnp.float32(0.0)
        )

    def timed(n):
        t0 = time.time()
        out = f(jnp.int32(n), *args)
        _ = float(out)
        return time.time() - t0

    timed(2)  # compile + warmup
    tlo, thi = timed(lo), timed(hi)
    return (thi - tlo) / (hi - lo) * 1e3


def report(name, ms, nbytes, flops=0):
    line = f"{name:44s} {ms:8.3f} ms   {nbytes / 1e9 / (ms / 1e3):7.1f} GB/s"
    if flops:
        line += f"   {flops / (ms / 1e3) / 1e12:6.1f} TF/s"
    print(line, flush=True)


# -- fused kernels, P stored (N, NJ, SUB, 128): contiguous row-block DMAs ------


def fused_fwd_4d(p4, rows, x0, *, r_tot, tr):
    n, nj, sub, lanes = p4.shape
    assert lanes == 128
    tkc = sub * 128
    npad = nj * tkc
    d = x0.shape[1]
    ni = r_tot // tr
    nsteps = ni * nj

    def dma(p_hbm, slab, sems, rows_ref, slot, i, j, r):
        return pltpu.make_async_copy(
            p_hbm.at[pl.ds(rows_ref[i * tr + r], 1), j],
            slab.at[slot, pl.ds(r, 1)],
            sems.at[slot, r],
        )

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
                dma(p_hbm, slab, sems, rows_ref, 0, i, j, r).start()

        @pl.when(nstep < nsteps)
        def _():
            for r in range(tr):
                dma(p_hbm, slab, sems, rows_ref, nslot, ni_, nj_, r).start()

        for r in range(tr):
            dma(p_hbm, slab, sems, rows_ref, slot, i, j, r).wait()

        part = jnp.zeros((tr, d), jnp.float32)
        for c in range(sub):
            part += jnp.dot(
                slab[slot, :, c, :],
                x0_ref[pl.ds(c * 128, 128), :],
                preferred_element_type=jnp.float32,
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

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ni, nj),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((tkc, d), lambda i, j, rows_ref: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tr, d), lambda i, j, rows_ref: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tr, sub, 128), jnp.bfloat16),
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
            bytes_accessed=r_tot * npad * 2 + ni * npad * d * 2 + r_tot * d * 4,
            transcendentals=0,
        ),
    )(rows, p4, x0.astype(jnp.bfloat16))


def fused_bwd_4d(p4, rows, ct, *, r_tot, tr):
    n, nj, sub, lanes = p4.shape
    tkc = sub * 128
    npad = nj * tkc
    d = ct.shape[1]
    ni = r_tot // tr
    nsteps = nj * ni

    def dma(p_hbm, slab, sems, rows_ref, slot, i, j, r):
        return pltpu.make_async_copy(
            p_hbm.at[pl.ds(rows_ref[i * tr + r], 1), j],
            slab.at[slot, pl.ds(r, 1)],
            sems.at[slot, r],
        )

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
                dma(p_hbm, slab, sems, rows_ref, 0, i, j, r).start()

        @pl.when(nstep < nsteps)
        def _():
            for r in range(tr):
                dma(p_hbm, slab, sems, rows_ref, nslot, ni_, nj_, r).start()

        for r in range(tr):
            dma(p_hbm, slab, sems, rows_ref, slot, i, j, r).wait()

        ct_b = ct_ref[:]
        for c in range(sub):
            part = jax.lax.dot_general(
                slab[slot, :, c, :], ct_b,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            @pl.when(i == 0)
            def _():
                out_ref[pl.ds(c * 128, 128), :] = part

            @pl.when(i > 0)
            def _():
                out_ref[pl.ds(c * 128, 128), :] = (
                    out_ref[pl.ds(c * 128, 128), :] + part
                )

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nj, ni),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((tr, d), lambda j, i, rows_ref: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tkc, d), lambda j, i, rows_ref: (j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tr, sub, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, tr)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((npad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_tot * npad * d,
            bytes_accessed=r_tot * npad * 2 + r_tot * d * 2 + npad * d * 4,
            transcendentals=0,
        ),
    )(rows, p4, ct.astype(jnp.bfloat16))


def to4d(p2, nj):
    """(n, npad) -> (n, nj, tkc/128, 128) on HOST (device reshape would copy
    10 GB through a relayout; numpy is free-ish)."""
    n, npad = p2.shape
    tkc = npad // nj
    return p2.reshape(n, nj, tkc // 128, 128)


def correctness():
    n, npad, r_tot, tr, nj, d = 712, 1024, 256, 64, 2, 64
    rng = np.random.default_rng(0)
    p_np = rng.standard_normal((n, npad)).astype(jnp.bfloat16)
    rows_np = rng.integers(0, n, size=r_tot).astype(np.int32)
    x0_np = rng.standard_normal((npad, d)).astype(np.float32)
    ct_np = rng.standard_normal((r_tot, d)).astype(np.float32)

    p = jnp.asarray(p_np)
    p4 = jnp.asarray(to4d(p_np, nj))
    rows = jnp.asarray(rows_np)
    x0 = jnp.asarray(x0_np)
    ct = jnp.asarray(ct_np)

    g = p[rows]
    y_ref = jnp.dot(g, x0.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    dx_ref = jax.lax.dot_general(
        g, ct.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    def relerr(a, b):
        return float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))

    print("correctness (small scale):", flush=True)
    print(f"  F4 fused fwd 4d: {relerr(fused_fwd_4d(p4, rows, x0, r_tot=r_tot, tr=tr), y_ref):.3e}", flush=True)
    print(f"  G4 fused bwd 4d: {relerr(fused_bwd_4d(p4, rows, ct, r_tot=r_tot, tr=tr), dx_ref):.3e}", flush=True)


def main():
    correctness()

    key = jax.random.PRNGKey(0)
    kp, kr, kx, kc = jax.random.split(key, 4)
    rows = jax.random.randint(kr, (R,), 0, N, dtype=jnp.int32)
    x0 = jax.random.normal(kx, (NPAD, D), dtype=jnp.float32)
    ct = jax.random.normal(kc, (R, D), dtype=jnp.float32)

    row_bytes = R * NPAD * 2
    flops = 2 * R * NPAD * D

    def smin(s):
        return jnp.minimum(s.astype(jnp.int32), 0)

    print("\ntiming (Gowalla scale):", flush=True)
    p = jax.random.normal(kp, (N, NPAD), dtype=jnp.bfloat16)

    # pre-gathered G for component timings
    g = jax.jit(lambda p, r: p.at[r].get(mode="promise_in_bounds"))(p, rows)

    t_sum = loop_time(
        lambda s, ga: jnp.sum(ga + s * 0e0).astype(jnp.float32) * 1e-20, g
    )
    t_gs = loop_time(
        lambda s, pa, ra: jnp.sum(
            pa.at[ra + smin(s)].get(mode="promise_in_bounds")
        ).astype(jnp.float32) * 1e-20,
        p, rows,
    )
    report("A0 full-sum of G (consume pass)", t_sum, row_bytes)
    report("A  XLA gather P[rows] (gather+sum-sum)", t_gs - t_sum, row_bytes)

    t = loop_time(
        lambda s, ga, xa: jnp.dot(
            ga, (xa + s * 1e-30).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )[0, 0] * 1e-20,
        g, x0,
    )
    report("B  XLA fwd dot G @ X0", t, row_bytes, flops)

    t = loop_time(
        lambda s, ga, ca: jax.lax.dot_general(
            ga, (ca + s * 1e-30).astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0, 0] * 1e-20,
        g, ct,
    )
    report("C  XLA bwd G^T @ ct", t, row_bytes, flops)
    del g
    gc.collect()

    def d_step(s, pa, ra, xa, ca):
        p_rows = pa.at[ra + smin(s)].get(mode="promise_in_bounds")
        y, vjpf = jax.vjp(
            lambda x: jnp.dot(
                p_rows, x.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ),
            xa,
        )
        (dx,) = vjpf(ca)
        return (y[0, 0] + dx[0, 0]) * 1e-20

    t = loop_time(d_step, p, rows, x0, ct)
    report("D  round-2 gather+fwd+bwd (old repo path)", t, 3 * row_bytes, 2 * flops)

    del p
    gc.collect()
    p4 = jax.random.normal(kp, (N, NJ, NPAD // NJ // 128, 128), dtype=jnp.bfloat16)

    t = loop_time(
        lambda s, pa, ra, xa: fused_fwd_4d(
            pa, ra + smin(s), xa, r_tot=R, tr=TR
        )[0, 0] * 1e-20,
        p4, rows, x0,
    )
    report("F4 Pallas fused fwd (4D contiguous DMA)", t, row_bytes, flops)
    t = loop_time(
        lambda s, pa, ra, ca: fused_bwd_4d(
            pa, ra + smin(s), ca, r_tot=R, tr=TR
        )[0, 0] * 1e-20,
        p4, rows, ct,
    )
    report("G4 Pallas fused bwd (4D contiguous DMA)", t, row_bytes, flops)

    from igcn_cf_tpu.kernels.pcache import cached_prop

    def e_step(s, pa, ra, xa, ca):
        r = ra + smin(s)
        y, vjpf = jax.vjp(lambda x: cached_prop(pa, r, x), xa)
        (dx,) = vjpf(ca)
        return (y[0, 0] + dx[0, 0]) * 1e-20

    t = loop_time(e_step, p4, rows, x0[:N], ct)
    report("E  repo cached_prop fwd+bwd (fused vjp)", t, 2 * row_bytes, 2 * flops)

    print(
        f"\nroofline: one pass over gathered rows = {row_bytes/1e9:.2f} GB "
        f"= {row_bytes/1e9/HBM_GBPS*1e3:.2f} ms @ {HBM_GBPS:.0f} GB/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
