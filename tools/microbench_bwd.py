"""Focused sweep of pcache BACKWARD kernel variants (the 9.45 ms bottleneck;
fwd is 2.6 ms — round-3 tune sweep).

Candidates:
  * prod `_fused_bwd` (dim0-contraction, Mosaic inserts per-tile transposes)
    at (nj=4, tr in {128, 64}) — the shipped baseline;
  * `bwd_t` (dX0^T = ct^T @ slab: ONE ct transpose per grid step, standard
    [M=d, K=tr, N=128] MXU dots) at (nj=4, tr=128) with vmem_limit_bytes
    raised — K=128 full contraction; this config previously failed at the
    default VMEM cap (slab 9.4 MB + out 4.7 MB);
  * `bwd_t` at (nj=8, tr=128) — fits the default cap, 18 KB DMAs.

Timing: traced-count fori_loop + readback differencing, arrays as jit args.
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

from igcn_cf_tpu.kernels.pcache import _fused_bwd

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


def bwd_t(p4, rows, ctb, *, tr, vmem_mb=None):
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

        ct_t = ct_ref[:].T  # (d, tr)

        for c in range(sub):
            part = jnp.dot(
                ct_t, slab[slot, :, c, :], preferred_element_type=jnp.float32
            )

            @pl.when(i == 0)
            def _():
                out_ref[:, pl.ds(c * lanes, lanes)] = part

            @pl.when(i > 0)
            def _():
                out_ref[:, pl.ds(c * lanes, lanes)] = (
                    out_ref[:, pl.ds(c * lanes, lanes)] + part
                )

    params = dict(dimension_semantics=("arbitrary", "arbitrary"))
    if vmem_mb:
        params["vmem_limit_bytes"] = vmem_mb * 1024 * 1024
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
        compiler_params=pltpu.CompilerParams(**params),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_tot * npad * d,
            bytes_accessed=r_tot * npad * 2 + r_tot * d * 2 + npad * d * 4,
            transcendentals=0,
        ),
    )(rows, p4, ctb)


def report(name, ms, nbytes, flops=0):
    line = f"{name:44s} {ms:8.3f} ms   {nbytes / 1e9 / (ms / 1e3):7.1f} GB/s"
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
    got = bwd_t(p4, rows, ctb, tr=tr).T
    err = float(jnp.abs(got - want).max() / (jnp.abs(want).max() + 1e-9))
    print(f"bwd_t correctness: {err:.2e}", flush=True)


def main():
    correctness()
    key = jax.random.PRNGKey(0)
    kp, kr, kc = jax.random.split(key, 3)
    rows = jax.random.randint(kr, (R,), 0, N, dtype=jnp.int32)
    ctb = jax.random.normal(kc, (R, D), dtype=jnp.float32).astype(jnp.bfloat16)
    ct32 = ctb.astype(jnp.float32)
    row_bytes = R * NPAD * 2
    flops = 2 * R * NPAD * D

    for nj, trs in ((4, (128, 64)), (8, (128,))):
        p4 = jax.random.normal(
            kp, (N, nj, NPAD // nj // 128, 128), dtype=jnp.bfloat16
        )
        for tr in trs:
            try:
                t = loop_time(
                    lambda s, pa, ra, ca: _fused_bwd(
                        pa, ra + smin(s), ca, tr=tr
                    )[0, 0] * 1e-20,
                    p4, rows, ctb,
                )
                report(f"prod bwd (dim0) nj={nj} tr={tr}", t, row_bytes, flops)
            except Exception as e:
                print(f"prod bwd nj={nj} tr={tr}: {type(e).__name__}: "
                      f"{str(e)[:110]}", flush=True)
            for vm in (None, 100):
                try:
                    t = loop_time(
                        lambda s, pa, ra, ca: bwd_t(
                            pa, ra + smin(s), ca, tr=tr, vmem_mb=vm
                        )[0, 0] * 1e-20,
                        p4, rows, ctb,
                    )
                    report(f"bwd_t nj={nj} tr={tr} vmem={vm}", t, row_bytes,
                           flops)
                except Exception as e:
                    print(f"bwd_t nj={nj} tr={tr} vmem={vm}: "
                          f"{type(e).__name__}: {str(e)[:110]}", flush=True)
        del p4

    print(
        f"roofline: {row_bytes/1e9:.2f} GB/pass = "
        f"{row_bytes/1e9/HBM_GBPS*1e3:.2f} ms @ {HBM_GBPS:.0f} GB/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
