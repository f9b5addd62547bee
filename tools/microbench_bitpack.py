"""Microbench for the round-2 bit-packed binary matmul design.

Timing protocol (the axon tunnel's block_until_ready does NOT wait for device
execution — verified 2026-08-19 with impossible 46 PFLOP/s readings): run a
jitted fori_loop with a TRACED iteration count, force a scalar D2H readback,
and difference two counts so dispatch/RPC overhead cancels:

    per_iter = (t(50) - t(10)) / 40

Measures, at Gowalla scale (M=30720, K=41984, d=64), per-matmul ms and
effective GB/s (of the B operand) for:

  A  XLA convert(int8->bf16) + dot, N=64            (round-1 plain path)
  B  Pallas bit-packed (int32 bit-plane) kernel, N=64
  C  Pallas bit-packed + fused dropout hash mask, N=64
  D  XLA dot_general contract-dim0 (B^T @ x), N=64  (transposed contraction)
  E  XLA int8 dot, N=128                            (N=64 MXU penalty probe)

All Pallas variants unpack 1-bit planes tile-wise: packed word tile
(TM, TKP=128) int32 -> 32 x (TM,128) bf16 sub-tiles -> 32 dots of
(TM,128)@(128,N) accumulated in a VMEM f32 scratch.
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

M, K, D = 30720, 41984, 64

TM = 512
TKP = 128  # packed words per tile (int32) -> TK = 4096 unpacked columns
TK = TKP * 32


def loop_time(one_mm, b, x, lo=6, hi=26):
    """ms per matmul via traced-count fori_loop + D2H readback differencing."""
    k_in = x.shape[0]
    d = x.shape[1]

    @jax.jit
    def f(b, x, n):
        def body(i, x):
            y = one_mm(b, x) * 1e-3  # (R, d)
            if y.shape[0] >= k_in:
                return y[:k_in].astype(x.dtype)
            return jnp.concatenate(
                [y, jnp.zeros((k_in - y.shape[0], d), y.dtype)], axis=0
            ).astype(x.dtype)

        return jax.lax.fori_loop(0, n, body, x)

    def timed(n):
        t0 = time.time()
        out = f(b, x, jnp.int32(n))
        _ = float(out[0, 0])
        return time.time() - t0

    timed(2)  # compile + warmup
    tlo, thi = timed(lo), timed(hi)
    return (thi - tlo) / (hi - lo) * 1e3


def pack_bits(b_i8: np.ndarray) -> np.ndarray:
    """Bit-plane pack: per TK-column tile, word w bit b = col (tile*TK + b*TKP + w)."""
    m, k = b_i8.shape
    assert k % TK == 0
    ntiles = k // TK
    r = b_i8.reshape(m, ntiles, 32, TKP).astype(np.uint32)
    words = (r << np.arange(32, dtype=np.uint32)[None, None, :, None]).sum(
        axis=2, dtype=np.uint32
    )
    return words.reshape(m, ntiles * TKP).astype(np.uint32)


def make_bitpack_kernel(n_cols: int, masked: bool):
    def kernel(w_ref, x_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = w_ref[:]  # (TM, TKP) uint32
        acc = acc_ref[:]
        for b in range(32):
            bits = (
                ((w >> np.uint32(b)) & np.uint32(1))
                .astype(jnp.int32)
                .astype(jnp.bfloat16)
            )
            if masked:
                i = pl.program_id(0)
                rows = jax.lax.broadcasted_iota(jnp.int32, (TM, TKP), 0) + i * TM
                cols = (
                    jax.lax.broadcasted_iota(jnp.int32, (TM, TKP), 1)
                    + j * TK
                    + b * TKP
                )
                h = (
                    rows.astype(jnp.uint32) * np.uint32(0x9E3779B9)
                    ^ cols.astype(jnp.uint32) * np.uint32(0x85EBCA6B)
                )
                h = (h ^ (h >> 16)) * np.uint32(0xC2B2AE35)
                keep = (h & np.uint32(0xFF)) >= np.uint32(77)
                bits = jnp.where(keep, bits, jnp.bfloat16(0.0))
            acc += jnp.dot(
                bits,
                x_ref[pl.ds(b * TKP, TKP), :],
                preferred_element_type=jnp.float32,
            )
        acc_ref[:] = acc

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kernel


def bitpack_mm(wpacked, x, n_cols, masked=False):
    m, kp = wpacked.shape
    k = kp * 32
    grid = (m // TM, kp // TKP)
    return pl.pallas_call(
        make_bitpack_kernel(n_cols, masked),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TKP), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, n_cols), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, n_cols), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TM, n_cols), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n_cols,
            bytes_accessed=m * kp * 4 + k * n_cols * 2 + m * n_cols * 4,
            transcendentals=0,
        ),
    )(wpacked, x.astype(jnp.bfloat16))


def main():
    rng = np.random.default_rng(0)
    kpad = -(-K // TK) * TK
    b_np = (rng.random((M, kpad)) < 0.0008).astype(np.int8)
    b_np[:, K:] = 0
    b_i8 = jnp.asarray(b_np)
    w = jnp.asarray(pack_bits(b_np))
    x64 = jnp.asarray(rng.standard_normal((kpad, 64)).astype(np.float32))
    x128 = jnp.asarray(rng.standard_normal((kpad, 128)).astype(np.float32))
    xm64 = jnp.asarray(rng.standard_normal((M, 64)).astype(np.float32))

    gb_i8 = M * kpad / 1e9
    gb_bit = M * kpad / 8 / 1e9

    def report(name, ms, gb):
        flops = 2 * M * kpad * 64
        print(
            f"{name:38s} {ms:8.3f} ms   {gb / (ms / 1e3):7.1f} GB/s(B)   "
            f"{flops / (ms / 1e3) / 1e12:6.1f} TFLOP/s(@64)",
            flush=True,
        )

    # correctness first (cheap, catches kernel bugs before long timing)
    ref = np.asarray(
        jnp.dot(b_i8.astype(jnp.bfloat16), x64.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    )
    got = np.asarray(bitpack_mm(w, x64, 64))
    err = np.abs(ref - got).max()
    print(f"bitpack vs XLA max abs err: {err:.3e}", flush=True)

    t = loop_time(
        lambda b, x: jnp.dot(b.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32),
        b_i8, x64,
    )
    report("A XLA int8->bf16 dot N=64", t, gb_i8)

    t = loop_time(lambda w_, x: bitpack_mm(w_, x, 64), w, x64)
    report("B Pallas bitpack N=64", t, gb_bit)

    t = loop_time(lambda w_, x: bitpack_mm(w_, x, 64, masked=True), w, x64)
    report("C Pallas bitpack+mask N=64", t, gb_bit)

    t = loop_time(
        lambda b, x: jax.lax.dot_general(
            b.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
        b_i8, xm64,
    )
    report("D XLA dim0-contract (B^T@x) N=64", t, gb_i8)

    t = loop_time(
        lambda b, x: jnp.dot(b.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32),
        b_i8, x128,
    )
    report("E XLA int8->bf16 dot N=128", t, gb_i8)


if __name__ == "__main__":
    main()
