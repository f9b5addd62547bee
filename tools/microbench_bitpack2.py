"""Round-2 bit-packed kernel design experiments (after microbench_bitpack):

  F  dim0-contraction kernel on packed B: out = B^T @ ct without storing a
     packed transpose (per bit-plane: (TM,128)^T @ (TM,64) dots into a
     (TK,64) VMEM accumulator). If this runs ~plain speed, BT storage dies.
  G  bit-sliced dropout mask: 8 hash grids + a bitwise >=thr comparator give
     a 32-bit keepword per packed word (8-bit threshold resolution), applied
     as ONE AND on the packed word — mask cost ~75 VPU ops/tile instead of
     per-plane hashing (measured 3.3ms -> target ~2ms).
  H  G + F combined: masked dim0-contraction (the feat backward pass).

Timing: traced-count fori_loop + D2H readback (see microbench_bitpack).
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

from tools.microbench_bitpack import M, K, TM, TKP, TK, loop_time, pack_bits

_C1 = np.uint32(0x9E3779B9)
_C2 = np.uint32(0x85EBCA6B)
_C3 = np.uint32(0xC2B2AE35)


def _hash(seed, rows, words):
    h = (rows.astype(jnp.uint32) * _C1) ^ (words.astype(jnp.uint32) * _C2) ^ seed
    h = (h ^ (h >> 16)) * _C3
    return h ^ (h >> 16)


def _keepword(seed, rows, words, thr: int):
    """32-bit keep word: bit b = [byte(r, c(b,w)) >= thr], byte bit-sliced
    from 8 salted hash grids. All 32 bit positions are compared in parallel
    by bitwise ops."""
    ge = jnp.zeros_like(rows, dtype=jnp.uint32)
    eq = jnp.full_like(rows, 0xFFFFFFFF, dtype=jnp.uint32)
    for i in range(7, -1, -1):
        h = _hash(seed + np.uint32((i * 0x9E3779B1 + 1) & 0xFFFFFFFF), rows, words)
        if (thr >> i) & 1:
            eq = eq & h
        else:
            ge = ge | (eq & h)
            eq = eq & (~h)
    return ge | eq


def make_fwd_kernel(n_cols: int, masked: bool, thr: int = 77):
    def kernel(seed_ref, w_ref, x_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = w_ref[:]
        if masked:
            i = pl.program_id(0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (TM, TKP), 0) + i * TM
            words = (
                jax.lax.broadcasted_iota(jnp.int32, (TM, TKP), 1) + j * TKP
            )
            w = w & _keepword(seed_ref[0], rows, words, thr)
        acc = acc_ref[:]
        for b in range(32):
            bits = (
                ((w >> np.uint32(b)) & np.uint32(1))
                .astype(jnp.int32)
                .astype(jnp.bfloat16)
            )
            acc += jnp.dot(
                bits, x_ref[pl.ds(b * TKP, TKP), :],
                preferred_element_type=jnp.float32,
            )
        acc_ref[:] = acc

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kernel


def fwd_mm(wpacked, x, n_cols, masked=False):
    m, kp = wpacked.shape
    grid = (m // TM, kp // TKP)
    return pl.pallas_call(
        make_fwd_kernel(n_cols, masked),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(jnp.uint32(1234).reshape(1), wpacked, x.astype(jnp.bfloat16))


def make_bwd_kernel(n_cols: int, masked: bool, thr: int = 77):
    """out[K,n] += B^T @ ct, iterating row blocks i inner, col blocks j outer."""

    def kernel(seed_ref, w_ref, ct_ref, out_ref, acc_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = w_ref[:]
        if masked:
            j = pl.program_id(0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (TM, TKP), 0) + i * TM
            words = (
                jax.lax.broadcasted_iota(jnp.int32, (TM, TKP), 1) + j * TKP
            )
            w = w & _keepword(seed_ref[0], rows, words, thr)
        ct = ct_ref[:]  # (TM, n_cols) bf16
        for b in range(32):
            bits = (
                ((w >> np.uint32(b)) & np.uint32(1))
                .astype(jnp.int32)
                .astype(jnp.bfloat16)
            )
            acc_ref[pl.ds(b * TKP, TKP), :] += jax.lax.dot_general(
                bits, ct,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(i == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kernel


def bwd_mm(wpacked, ct, n_cols, masked=False):
    m, kp = wpacked.shape
    k = kp * 32
    grid = (kp // TKP, m // TM)  # j outer, i inner
    return pl.pallas_call(
        make_bwd_kernel(n_cols, masked),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, TKP), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, n_cols), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TK, n_cols), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n_cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TK, n_cols), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.uint32(1234).reshape(1), wpacked, ct.astype(jnp.bfloat16))


def main():
    rng = np.random.default_rng(0)
    kpad = -(-K // TK) * TK
    b_np = (rng.random((M, kpad)) < 0.0008).astype(np.int8)
    b_np[:, K:] = 0
    w = jnp.asarray(pack_bits(b_np))
    x64 = jnp.asarray(rng.standard_normal((kpad, 64)).astype(np.float32))
    xm64 = jnp.asarray(rng.standard_normal((M, 64)).astype(np.float32))
    gb_bit = M * kpad / 8 / 1e9

    def report(name, ms):
        flops = 2 * M * kpad * 64
        print(
            f"{name:34s} {ms:8.3f} ms   {gb_bit / (ms / 1e3):7.1f} GB/s(B)   "
            f"{flops / (ms / 1e3) / 1e12:6.1f} TFLOP/s(@64)",
            flush=True,
        )

    # correctness: bwd (dim0-contract) vs fwd on transposed reference
    b_small = b_np[:, :TK]
    ref = b_small.astype(np.float32).T @ np.asarray(xm64)
    got = np.asarray(bwd_mm(jnp.asarray(pack_bits(b_small)), xm64, 64))
    print("bwd dim0-contract max err:", np.abs(ref - got).max(), flush=True)

    t = loop_time(lambda w_, x: fwd_mm(w_, x, 64, masked=True), w, x64)
    report("G fwd bitpack + bitsliced mask", t)
    t = loop_time(lambda w_, x: bwd_mm(w_, x, 64), w, xm64)
    report("F bwd dim0-contract plain", t)
    t = loop_time(lambda w_, x: bwd_mm(w_, x, 64, masked=True), w, xm64)
    report("H bwd dim0-contract + mask", t)


if __name__ == "__main__":
    main()
