"""Pcache FORWARD sweep #2 (after microbench_fwd2 ruled out the single big
dot: Mosaic rejects 2-contracting-dim dot_general on the 3-D slab and the
full batched form crashes the compiler).

Hypothesis: the per-c loop's cost is the SERIAL dependency chain
``part += dot(...)`` — 144 dependent (128,128)@(128,64) MXU ops at ~109
cycles each ≈ the 1-row/cycle M-streaming floor with no cross-dot overlap.
Variants:

  fwd_loop    — production baseline (single accumulator chain).
  fwd_acc4    — 4 independent accumulators, c strided; dots with no data
                dependence can overlap in the MXU pipeline; tree-add at end.
  fwd_acc8    — 8 accumulators.
  fwd_resh    — slab[slot].reshape(tr, tkc) then ONE big-K dot (Mosaic may
                insert a relayout; measure whether it's affordable).
  fwd_chunkb  — in-kernel loop over c-chunks of 16, each a 16-batch
                dot_general then sum (smaller batched op than the crashing
                full-sub version).

Run: python tools/microbench_fwd3.py
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


def _make(compute, p4, rows, x0_arr, x0_spec_shape, x0_index_map, tr, d,
          vmem_mb=100):
    """Shared fwd kernel scaffold: identical DMA stream, pluggable compute."""
    n, nj, sub, lanes = p4.shape
    tkc = sub * lanes
    npad = nj * tkc
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

        part = compute(slab, slot, x0_ref, tr, sub, lanes, d)

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
                pl.BlockSpec(x0_spec_shape, x0_index_map,
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
    )(rows, p4, x0_arr)


def _c_loop(slab, slot, x0_ref, tr, sub, lanes, d):
    part = jnp.zeros((tr, d), jnp.float32)
    for c in range(sub):
        part += jnp.dot(slab[slot, :, c, :], x0_ref[pl.ds(c * lanes, lanes), :],
                        preferred_element_type=jnp.float32)
    return part


def _c_acck(k):
    def f(slab, slot, x0_ref, tr, sub, lanes, d):
        accs = [jnp.zeros((tr, d), jnp.float32) for _ in range(k)]
        for c in range(sub):
            accs[c % k] = accs[c % k] + jnp.dot(
                slab[slot, :, c, :], x0_ref[pl.ds(c * lanes, lanes), :],
                preferred_element_type=jnp.float32)
        while len(accs) > 1:
            accs = [a + b for a, b in zip(accs[::2], accs[1::2])] + (
                [accs[-1]] if len(accs) % 2 else [])
        return accs[0]
    return f


def _c_resh(slab, slot, x0_ref, tr, sub, lanes, d):
    s2 = slab[slot].reshape(tr, sub * lanes)
    return jnp.dot(s2, x0_ref[:], preferred_element_type=jnp.float32)


def _c_chunkb(ch):
    def f(slab, slot, x0_ref, tr, sub, lanes, d):
        part = jnp.zeros((tr, d), jnp.float32)
        for c0 in range(0, sub, ch):
            bm = jax.lax.dot_general(
                slab[slot, :, c0:c0 + ch, :], x0_ref[0, c0:c0 + ch],
                dimension_numbers=(((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (ch, tr, d)
            part = part + jnp.sum(bm, axis=0)
        return part
    return f


def report(name, ms, nbytes, flops=0):
    line = f"{name:40s} {ms:8.3f} ms   {nbytes / 1e9 / (ms / 1e3):7.1f} GB/s"
    if flops:
        line += f"   {flops / (ms / 1e3) / 1e12:6.1f} TF/s"
    print(line, flush=True)


def run_case(name, compute, p4, rows, xarg, shape, imap, tr, row_bytes, flops):
    try:
        t = loop_time(
            lambda s, pa, ra, xa: _make(
                compute, pa, ra + smin(s), xa, shape, imap, tr, D
            ).ravel()[0] * 1e-20,
            p4, rows, xarg,
        )
        report(name, t, row_bytes, flops)
        return t
    except Exception as e:
        print(f"{name}: {type(e).__name__}: {str(e)[:110]}", flush=True)
        return None


def correctness():
    n, nj, sub, d, tr = 700, 2, 16, 64, 64
    lanes = 128
    r_tot = 3 * tr
    npad = nj * sub * lanes
    rng = np.random.default_rng(0)
    p4 = jnp.asarray(rng.standard_normal((n, nj, sub, lanes))).astype(jnp.bfloat16)
    rows = jnp.asarray(rng.integers(0, n, size=r_tot).astype(np.int32))
    x0 = jnp.asarray(rng.standard_normal((npad, d))).astype(jnp.bfloat16)
    x0r = x0.reshape(nj, sub, lanes, d)
    want = jnp.dot(p4.reshape(n, npad)[rows], x0,
                   preferred_element_type=jnp.float32)
    tkc = sub * lanes
    flat_spec = ((tkc, d), lambda i, j, rows_ref: (j, 0))
    r4_spec = ((1, sub, lanes, d), lambda i, j, rows_ref: (j, 0, 0, 0))
    cases = [
        ("fwd_acc4", _c_acck(4), x0, *flat_spec),
        ("fwd_resh", _c_resh, x0, *flat_spec),
        ("fwd_chunkb8", _c_chunkb(8), x0r, *r4_spec),
    ]
    for name, compute, xarg, shape, imap in cases:
        try:
            got = _make(compute, p4, rows, xarg, shape, imap, tr, d)
            err = float(jnp.abs(got - want).max() / (jnp.abs(want).max() + 1e-9))
            print(f"{name}: relerr {err:.2e}", flush=True)
        except Exception as e:
            print(f"{name}: {type(e).__name__}: {str(e)[:150]}", flush=True)


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
        tkc = sub * 128
        p4 = jax.random.normal(kp, (N, nj, sub, 128), dtype=jnp.bfloat16)
        x0r = x0.reshape(nj, sub, 128, D)
        flat_spec = ((tkc, D), lambda i, j, rows_ref: (j, 0))
        r4_spec = ((1, sub, 128, D), lambda i, j, rows_ref: (j, 0, 0, 0))
        tr = 128
        run_case(f"fwd_loop nj={nj}", _c_loop, p4, rows, x0, *flat_spec,
                 tr=tr, row_bytes=row_bytes, flops=flops)
        for k in (2, 4, 8):
            run_case(f"fwd_acc{k} nj={nj}", _c_acck(k), p4, rows, x0,
                     *flat_spec, tr=tr, row_bytes=row_bytes, flops=flops)
        run_case(f"fwd_resh nj={nj}", _c_resh, p4, rows, x0, *flat_spec,
                 tr=tr, row_bytes=row_bytes, flops=flops)
        for ch in (8, 16):
            if sub % ch == 0:
                run_case(f"fwd_chunkb{ch} nj={nj}", _c_chunkb(ch), p4, rows,
                         x0r, *r4_spec, tr=tr, row_bytes=row_bytes, flops=flops)
        del p4

    print(
        f"roofline: {row_bytes/1e9:.2f} GB/pass = "
        f"{row_bytes/1e9/HBM_GBPS*1e3:.2f} ms @ {HBM_GBPS:.0f} GB/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
