"""Pcache FORWARD sweep: kill the per-c accumulation loop (round-4 item #1).

Round-3 drove the backward from 9.4 -> 2.03 ms by replacing 144 small
per-column-tile dots per grid step with ONE whole-slab ``dot_general``
(tools/microbench_bwd2.py). The forward kernel still runs the 144-dot loop:

    for c in range(sub):                       # sub = 144 at Gowalla scale
        part += slab[slot, :, c, :] @ x0[c]    # (tr,128)@(128,64)

and measures ~3 ms of the 5.0 ms fused fwd+bwd piece (BENCH_r03
init_ab_ms: pcache 5.03 ms total, bwd alone 2.03 ms) vs a ~1.1 ms one-pass
HBM floor. Variants tested here, all on the identical per-row DMA stream:

  fwd_loop   — the production per-c loop (baseline).
  fwd_one2   — ONE dot_general contracting BOTH slab dims:
               slab (tr, sub, lanes) x x0r (sub, lanes, d) dims ((1,2),(0,1)).
               x0 is passed pre-reshaped (nj, sub, lanes, d) outside.
  fwd_batch  — batched matmul, batch dim = sub, then reduce:
               dot_general(((2,),(1,)), ((1,),(0,))) -> (sub, tr, d), sum(0).
  fwd_loopT  — per-c loop but accumulating into a VMEM scratch column slice
               (matches bwd_acc structure) to separate vreg-accumulate cost
               from dot-issue cost.

Run: python tools/microbench_fwd2.py
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


def _mk(kernel_body, p4, rows, x0_spec, x0_arr, tr, extra_scratch=(),
        vmem_mb=100):
    n, nj, sub, lanes = p4.shape
    tkc = sub * lanes
    npad = nj * tkc
    r_tot = rows.shape[0]
    ni = r_tot // tr
    return pl.pallas_call(
        kernel_body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ni, nj),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), x0_spec],
            out_specs=pl.BlockSpec((tr, D), lambda i, j, rows_ref: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tr, sub, lanes), jnp.bfloat16),
                pltpu.VMEM((tr, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2, tr)),
                *extra_scratch,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((r_tot, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_tot * npad * D,
            bytes_accessed=r_tot * npad * 2 + npad * D * 2 + r_tot * D * 4,
            transcendentals=0,
        ),
    )(rows, p4, x0_arr)


def _prelude(p4, tr, r_tot):
    n, nj, sub, lanes = p4.shape
    ni = r_tot // tr
    nsteps = ni * nj

    def pre(rows_ref, p_hbm, slab, sems):
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

        return i, j, slot

    return pre, nj, sub, lanes


def fwd_loop(p4, rows, x0b, *, tr):
    """Production kernel: per-c accumulate loop."""
    r_tot = rows.shape[0]
    pre, nj, sub, lanes = _prelude(p4, tr, r_tot)
    tkc = sub * lanes

    def kernel(rows_ref, p_hbm, x0_ref, out_ref, slab, acc, sems):
        i, j, slot = pre(rows_ref, p_hbm, slab, sems)
        part = jnp.zeros((tr, D), jnp.float32)
        for c in range(sub):
            part += jnp.dot(
                slab[slot, :, c, :],
                x0_ref[pl.ds(c * lanes, lanes), :],
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

    spec = pl.BlockSpec((tkc, D), lambda i, j, rows_ref: (j, 0),
                        memory_space=pltpu.VMEM)
    return _mk(kernel, p4, rows, spec, x0b, tr)


def fwd_one2(p4, rows, x0r, *, tr):
    """ONE dot_general contracting both slab dims; x0r is (nj, sub, lanes, D)."""
    r_tot = rows.shape[0]
    pre, nj, sub, lanes = _prelude(p4, tr, r_tot)

    def kernel(rows_ref, p_hbm, x0_ref, out_ref, slab, acc, sems):
        i, j, slot = pre(rows_ref, p_hbm, slab, sems)
        part = jax.lax.dot_general(
            slab[slot], x0_ref[0],
            dimension_numbers=(((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tr, D)

        @pl.when(j == 0)
        def _():
            acc[:] = part

        @pl.when(j > 0)
        def _():
            acc[:] = acc[:] + part

        @pl.when(j == nj - 1)
        def _():
            out_ref[:] = acc[:]

    spec = pl.BlockSpec((1, sub, lanes, D), lambda i, j, rows_ref: (j, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return _mk(kernel, p4, rows, spec, x0r, tr)


def fwd_batch(p4, rows, x0r, *, tr):
    """Batched matmul over sub then reduce; x0r is (nj, sub, lanes, D)."""
    r_tot = rows.shape[0]
    pre, nj, sub, lanes = _prelude(p4, tr, r_tot)

    def kernel(rows_ref, p_hbm, x0_ref, out_ref, slab, acc, sems):
        i, j, slot = pre(rows_ref, p_hbm, slab, sems)
        bm = jax.lax.dot_general(
            slab[slot], x0_ref[0],
            dimension_numbers=(((2,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (sub, tr, D)
        part = jnp.sum(bm, axis=0)

        @pl.when(j == 0)
        def _():
            acc[:] = part

        @pl.when(j > 0)
        def _():
            acc[:] = acc[:] + part

        @pl.when(j == nj - 1)
        def _():
            out_ref[:] = acc[:]

    spec = pl.BlockSpec((1, sub, lanes, D), lambda i, j, rows_ref: (j, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return _mk(kernel, p4, rows, spec, x0r, tr)


def report(name, ms, nbytes, flops=0):
    line = f"{name:40s} {ms:8.3f} ms   {nbytes / 1e9 / (ms / 1e3):7.1f} GB/s"
    if flops:
        line += f"   {flops / (ms / 1e3) / 1e12:6.1f} TF/s"
    print(line, flush=True)


def correctness():
    n, nj, sub, d, tr = 700, 2, 16, 64, 64
    r_tot = 3 * tr
    lanes = 128
    npad = nj * sub * lanes
    rng = np.random.default_rng(0)
    p4 = jnp.asarray(rng.standard_normal((n, nj, sub, lanes))).astype(jnp.bfloat16)
    rows = jnp.asarray(rng.integers(0, n, size=r_tot).astype(np.int32))
    x0 = jnp.asarray(rng.standard_normal((npad, d))).astype(jnp.bfloat16)
    x0r = x0.reshape(nj, sub, lanes, d)
    want = jnp.dot(p4.reshape(n, npad)[rows], x0,
                   preferred_element_type=jnp.float32)

    def relerr(got):
        return float(jnp.abs(got - want).max() / (jnp.abs(want).max() + 1e-9))

    global D
    D_saved = D
    D = d
    try:
        print(f"fwd_loop:  {relerr(fwd_loop(p4, rows, x0, tr=tr)):.2e}", flush=True)
        for name, fn in (("fwd_one2", fwd_one2), ("fwd_batch", fwd_batch)):
            try:
                print(f"{name}: {relerr(fn(p4, rows, x0r, tr=tr)):.2e}", flush=True)
            except Exception as e:
                print(f"{name}: {type(e).__name__}: {str(e)[:150]}", flush=True)
    finally:
        D = D_saved


def main():
    correctness()
    key = jax.random.PRNGKey(0)
    kp, kr, kx = jax.random.split(key, 3)
    rows = jax.random.randint(kr, (R,), 0, N, dtype=jnp.int32)
    x0 = jax.random.normal(kx, (NPAD, D), dtype=jnp.float32).astype(jnp.bfloat16)
    row_bytes = R * NPAD * 2
    flops = 2 * R * NPAD * D

    for nj in (4, 8):
        sub = NPAD // nj // 128
        p4 = jax.random.normal(kp, (N, nj, sub, 128), dtype=jnp.bfloat16)
        x0r = x0.reshape(nj, sub, 128, D)
        for tr in (128, 256):
            if R % tr:
                continue
            cases = [("fwd_loop", fwd_loop, x0)]
            cases += [("fwd_one2", fwd_one2, x0r), ("fwd_batch", fwd_batch, x0r)]
            for name, fn, xarg in cases:
                try:
                    t = loop_time(
                        lambda s, pa, ra, xa: fn(
                            pa, ra + smin(s), xa, tr=tr
                        ).ravel()[0] * 1e-20,
                        p4, rows, xarg,
                    )
                    report(f"{name} nj={nj} tr={tr}", t, row_bytes, flops)
                except Exception as e:
                    print(f"{name} nj={nj} tr={tr}: {type(e).__name__}: "
                          f"{str(e)[:110]}", flush=True)
        del p4

    print(
        f"roofline: {row_bytes/1e9:.2f} GB/pass = "
        f"{row_bytes/1e9/HBM_GBPS*1e3:.2f} ms @ {HBM_GBPS:.0f} GB/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
