"""Second pcache-backward sweep: kill the per-c predication/store overhead.

Round-3 sweep #1 found bwd_t (dX0^T = ct^T @ slab) at (nj=4, tr=128,
vmem=100MB) = 7.13 ms vs the 9.4 ms prod dim0 kernel — but still 3x the fwd
kernel's 2.6 ms on an IDENTICAL DMA stream, so the gap is compute-pipeline
structure, not DMA. Hypotheses tested here:

  v1 `bwd_acc`  — accumulate into a VMEM scratch with ONE predicated zero
                  per grid step (hoisted out of the c loop) and a single
                  flush at the last i; the c loop is pure dot+add.
  v2 `bwd_one`  — ONE lax.dot_general per grid step contracting the whole
                  3-D slab (tr, sub, 128) against ct^T (d, tr) -> accumulate
                  a (d, sub, 128) block; output stays 4-D (d, nj, sub, 128)
                  and the caller reshapes once outside.
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


def _common(p4, ctb, tr):
    n, nj, sub, lanes = p4.shape
    tkc = sub * lanes
    r_tot = ctb.shape[0]
    ni = r_tot // tr
    return n, nj, sub, lanes, tkc, nj * tkc, r_tot, ni


def bwd_acc(p4, rows, ctb, *, tr, vmem_mb=100):
    n, nj, sub, lanes, tkc, npad, r_tot, ni = _common(p4, ctb, tr)
    d = ctb.shape[1]
    nsteps = nj * ni

    def kernel(rows_ref, p_hbm, ct_ref, out_ref, slab, acc, sems):
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

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        ct_t = ct_ref[:].T  # (d, tr)
        for c in range(sub):
            acc[:, pl.ds(c * lanes, lanes)] = acc[
                :, pl.ds(c * lanes, lanes)
            ] + jnp.dot(ct_t, slab[slot, :, c, :],
                        preferred_element_type=jnp.float32)

        @pl.when(i == ni - 1)
        def _():
            out_ref[:] = acc[:]

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
                pltpu.VMEM((d, tkc), jnp.float32),
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


def bwd_one(p4, rows, ctb, *, tr, vmem_mb=100):
    """One dot_general per grid step over the whole 3-D slab; 4-D output."""
    n, nj, sub, lanes, tkc, npad, r_tot, ni = _common(p4, ctb, tr)
    d = ctb.shape[1]
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
        # (d, tr) x (tr, sub, lanes) contracting tr -> (d, sub, lanes)
        part = jax.lax.dot_general(
            ct_t, slab[slot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == 0)
        def _():
            out_ref[:] = part.reshape(1, d, sub, lanes)

        @pl.when(i > 0)
        def _():
            out_ref[:] = out_ref[:] + part.reshape(1, d, sub, lanes)

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
            out_specs=pl.BlockSpec((1, d, sub, lanes),
                                   lambda j, i, rows_ref: (j, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tr, sub, lanes), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, tr)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nj, d, sub, lanes), jnp.float32),
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


def to2d_one(out4):  # (nj, d, sub, lanes) -> (d, npad)
    nj, d, sub, lanes = out4.shape
    return jnp.moveaxis(out4, 1, 0).reshape(d, nj * sub * lanes)


def report(name, ms, nbytes, flops=0):
    line = f"{name:40s} {ms:8.3f} ms   {nbytes / 1e9 / (ms / 1e3):7.1f} GB/s"
    if flops:
        line += f"   {flops / (ms / 1e3) / 1e12:6.1f} TF/s"
    print(line, flush=True)


def correctness():
    n, nj, sub, d, tr = 700, 2, 8, 32, 64
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

    def relerr(got):
        return float(jnp.abs(got - want).max() / (jnp.abs(want).max() + 1e-9))

    print(f"bwd_acc: {relerr(bwd_acc(p4, rows, ctb, tr=tr).T):.2e}", flush=True)
    print(f"bwd_one: {relerr(to2d_one(bwd_one(p4, rows, ctb, tr=tr)).T):.2e}",
          flush=True)


def main():
    correctness()
    key = jax.random.PRNGKey(0)
    kp, kr, kc = jax.random.split(key, 3)
    rows = jax.random.randint(kr, (R,), 0, N, dtype=jnp.int32)
    ctb = jax.random.normal(kc, (R, D), dtype=jnp.float32).astype(jnp.bfloat16)
    row_bytes = R * NPAD * 2
    flops = 2 * R * NPAD * D

    for nj in (2, 4, 8):
        p4 = jax.random.normal(
            kp, (N, nj, NPAD // nj // 128, 128), dtype=jnp.bfloat16
        )
        for name, fn in (("bwd_acc", bwd_acc), ("bwd_one", bwd_one)):
            try:
                t = loop_time(
                    lambda s, pa, ra, ca: fn(
                        pa, ra + smin(s), ca, tr=128
                    ).ravel()[0] * 1e-20,
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
