"""Round-4 bit-packed kernel sweep: FLAT-DOT variants of the fwd/bwd
bit-plane matmuls (the round-4 pcache finding — one big-K/flat dot per grid
step beats a chain of 32 small per-plane dots — applied to
kernels/bitpack.py, whose backward is the biggest piece of the IGCN step
after round 4: feat_agg bwd ~5.1 ms of a 14.3 ms step, PROFILE_STEP.json).

  fwd_prod   — production: 32 x (TM,128)@(128,64) dots, vreg accumulate.
  fwd_flat   — concat the 32 unpacked planes -> (TM, 4096) bf16, ONE dot
               @ x tile (4096, 64).
  bwd_prod   — production: 32 dim0-contraction dots + 32 VMEM acc slices.
  bwd_flat   — concat planes -> (TM, 4096), ONE dim0-contraction dot ->
               (4096, 64), ONE acc update.

Run: python tools/microbench_bitpack3.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.microbench_bitpack import M, K, D, TM, TKP, TK, loop_time
from igcn_cf_tpu.kernels.bitpack import pack_bits

HBM_GBPS = 819.0


def _planes(w):
    return [
        ((w >> np.uint32(b)) & np.uint32(1)).astype(jnp.int32).astype(jnp.bfloat16)
        for b in range(32)
    ]


def fwd_flat_kernel(w_ref, x_ref, out_ref, acc_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bits = jnp.concatenate(_planes(w_ref[:]), axis=1)  # (TM, TK)
    acc_ref[:] += jnp.dot(bits, x_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def fwd_flat(wp, x):
    m, kp = wp.shape
    d = x.shape[1]
    return pl.pallas_call(
        fwd_flat_kernel,
        grid=(m // TM, kp // TKP),
        in_specs=[
            pl.BlockSpec((TM, TKP), lambda i, j: (i, j)),
            pl.BlockSpec((TK, d), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TM, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TM, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * kp * 32 * d,
            bytes_accessed=m * kp * 4 + kp * 32 * d * 2 + m * d * 4,
            transcendentals=0,
        ),
    )(wp, x.astype(jnp.bfloat16))


def bwd_flat_kernel(w_ref, ct_ref, out_ref, acc_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bits = jnp.concatenate(_planes(w_ref[:]), axis=1)  # (TM, TK)
    acc_ref[:] += jax.lax.dot_general(
        bits, ct_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TK, d)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def bwd_flat(wp, ct):
    m, kp = wp.shape
    d = ct.shape[1]
    k = kp * 32
    return pl.pallas_call(
        bwd_flat_kernel,
        grid=(kp // TKP, m // TM),
        in_specs=[
            pl.BlockSpec((TM, TKP), lambda j, i: (i, j)),
            pl.BlockSpec((TM, d), lambda j, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((TK, d), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((k, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TK, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * d,
            bytes_accessed=m * kp * 4 + m * d * 2 + k * d * 4,
            transcendentals=0,
        ),
    )(wp, ct.astype(jnp.bfloat16))


def main():
    from igcn_cf_tpu.kernels.bitpack import bb_matmul

    rng = np.random.default_rng(0)
    b_small = (rng.random((1024, TK)) < 0.02).astype(np.uint8)
    wp_small = jnp.asarray(pack_bits(b_small))
    x_small = jnp.asarray(rng.normal(size=(TK, D)).astype(np.float32))
    ct_small = jnp.asarray(rng.normal(size=(1024, D)).astype(np.float32))
    want_f = b_small.astype(np.float32) @ np.asarray(x_small, np.float64).astype(np.float32)
    got_f = np.asarray(fwd_flat(wp_small, x_small))
    err = np.abs(got_f - want_f).max() / (np.abs(want_f).max() + 1e-9)
    print(f"fwd_flat relerr {err:.2e}", flush=True)
    want_b = b_small.astype(np.float32).T @ np.asarray(ct_small)
    got_b = np.asarray(bwd_flat(wp_small, ct_small))
    err = np.abs(got_b - want_b).max() / (np.abs(want_b).max() + 1e-9)
    print(f"bwd_flat relerr {err:.2e}", flush=True)

    Kx = (K // TK) * TK  # pack_bits needs a TK multiple
    b = (rng.random((M, Kx)) < 0.001).astype(np.uint8)
    wp = jnp.asarray(pack_bits(b))
    x = jnp.asarray(rng.normal(size=(Kx, D)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    b_bytes = M * Kx / 8

    t = loop_time(lambda w, xx: bb_matmul(w, xx, False), wp, x)
    print(f"fwd_prod : {t:7.2f} ms  {b_bytes/1e9/(t/1e3):6.1f} GB/s", flush=True)
    t = loop_time(fwd_flat, wp, x)
    print(f"fwd_flat : {t:7.2f} ms  {b_bytes/1e9/(t/1e3):6.1f} GB/s", flush=True)
    t = loop_time(lambda w, cc: bb_matmul(w, cc, True), wp, ct)
    print(f"bwd_prod : {t:7.2f} ms  {b_bytes/1e9/(t/1e3):6.1f} GB/s", flush=True)
    t = loop_time(bwd_flat, wp, ct)
    print(f"bwd_flat : {t:7.2f} ms  {b_bytes/1e9/(t/1e3):6.1f} GB/s", flush=True)


if __name__ == "__main__" and "--dropped" not in sys.argv:
    main()


def dropped():
    """Dropout-masked variants: the keepword hash runs per (row, word) tile —
    measure its real cost vs the unmasked kernels."""
    from igcn_cf_tpu.kernels.bitpack import bb_matmul_dropped

    rng = np.random.default_rng(0)
    Kx = (K // TK) * TK
    b = (rng.random((M, Kx)) < 0.001).astype(np.uint8)
    wp = jnp.asarray(pack_bits(b))
    x = jnp.asarray(rng.normal(size=(Kx, D)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    b_bytes = M * Kx / 8
    key = jax.random.PRNGKey(7)

    t = loop_time(lambda w, xx: bb_matmul_dropped(w, xx, key, 0.3, False), wp, x)
    print(f"fwd_drop : {t:7.2f} ms  {b_bytes/1e9/(t/1e3):6.1f} GB/s", flush=True)
    t = loop_time(lambda w, cc: bb_matmul_dropped(w, cc, key, 0.3, True), wp, ct)
    print(f"bwd_drop : {t:7.2f} ms  {b_bytes/1e9/(t/1e3):6.1f} GB/s", flush=True)

    # full feat-agg fwd+bwd VJP at bench scale for attribution
    import pickle
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, ".bench_dataset.pkl"), "rb") as f:
        ds = pickle.load(f)
    from igcn_cf_tpu.models.base import get_model
    model = get_model({"name": "IGCN", "embedding_size": 64, "n_layers": 3,
                       "dropout": 0.0, "feature_ratio": 1.0,
                       "prop_cache": False}, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    buffers = model.init_buffers()
    from igcn_cf_tpu.utils.timing import scan_ms

    def nodrop_vjp(s, p, bufs):
        g = jax.grad(lambda pp: jnp.sum(
            model.inductive_rep_layer(
                dict(pp, w=pp["w"] + s * 1e-30), bufs, train=True, key=None
            ) ** 2
        ))(p)
        return g["embedding"][0, 0] * 1e-20

    print(f"feat_agg fwd+bwd NO-drop: "
          f"{scan_ms(nodrop_vjp, params, buffers):7.2f} ms", flush=True)


if __name__ == "__main__" and "--dropped" in sys.argv:
    dropped()
