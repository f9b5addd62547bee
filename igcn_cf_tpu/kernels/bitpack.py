"""1-bit-packed binary matmul kernels: Y = B @ X, Y = B^T @ X, and their
dropout-masked variants, with B stored at ONE BIT per entry.

Every graph matrix in this workload is a binary interaction pattern
(reference model.py:85-94 adjacency, model.py:386-421 feat-mat patterns), so
B is stored bit-packed: 32 entries per uint32 word — 8x less HBM than the
round-1 int8 engine and 16x less than bf16. At Gowalla scale one orientation
is 161 MB; Amazon-book is 621 MB. No transpose copy is stored at all: the
transposed product runs as a dim0-contraction over the same packed tiles
(measured within ~7% of the forward kernel, KERNEL_FINDINGS.md).

Packing layout (host, ``pack_bits``): columns are grouped in TK=4096-wide
tiles; within a tile, bit b of word lane w holds column ``b*128 + w``:

    word_index(c) = (c // 4096) * 128 + (c % 128)
    bit_index(c)  = (c % 4096) // 128

so a (TM, 128)-lane uint32 tile carries a (TM, 4096) binary tile, unpacked
in-kernel as 32 bit-plane shifts feeding 32 MXU dots — the unpack rides the
VPU underneath the MXU time (measured: packed 1.94 ms vs int8 1.84 ms per
Gowalla-scale pass, while the HBM stream drops 8x; the pass is MXU-bound at
the d=64 lane ceiling, see KERNEL_FINDINGS.md).

Dropout masking (reference model.py:263-275 edge dropout; masking structural
zeros is a no-op) is ONE bitwise AND on the packed words: a 32-bit keep-word
is built per packed word from 8 salted coordinate hashes via a BIT-SLICED
>=threshold comparator — all 32 columns' 8-bit uniform variates are compared
against round(p*256) simultaneously with ~30 bitwise ops. The keep decision
is a pure function of the canonical (row, column) coordinate, so the
backward (dim0-contraction) pass over the SAME tiles regenerates the
bit-identical mask — no transposed random stream, no extra HBM traffic
(p is quantized to 1/256 steps, the round-1 deviation, kept).

A pure-XLA fallback (non-TPU backends and non-tile-divisible shapes)
materializes the identical unpacked matrix and mask, so CPU unit tests are
bit-comparable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TM = 512  # sublane tile (output rows of the forward kernel)
TKP = 128  # packed word lanes per tile
TK = TKP * 32  # unpacked columns per tile

# multiply-xorshift mixing constants (splitmix/wyhash-style finalizer on u32)
_C1 = np.uint32(0x9E3779B9)
_C2 = np.uint32(0x85EBCA6B)
_C3 = np.uint32(0xC2B2AE35)


def pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


# -- host-side packing --------------------------------------------------------


def pack_bits(b: np.ndarray) -> np.ndarray:
    """(M, K) 0/1 -> (M, K/32) uint32 in the bit-plane tile layout. K must be
    a multiple of TK (pad first)."""
    m, k = b.shape
    assert k % TK == 0, (m, k)
    ntiles = k // TK
    r = b.reshape(m, ntiles, 32, TKP).astype(np.uint32)
    words = (r << np.arange(32, dtype=np.uint32)[None, None, :, None]).sum(
        axis=2, dtype=np.uint32
    )
    return np.ascontiguousarray(words.reshape(m, ntiles * TKP))


def pack_interactions(
    train_array: np.ndarray, n_rows: int, n_cols: int
) -> tuple[np.ndarray, int, int]:
    """Pack a [row, col] interaction list into the padded bit layout without
    materializing the dense matrix. Returns (packed, rows_padded, cols_padded)."""
    mp, kp = pad_to(n_rows, TM), pad_to(n_cols, TK)
    packed = np.zeros((mp, kp // 32), dtype=np.uint32)
    if len(train_array):
        rows = train_array[:, 0].astype(np.int64)
        cols = train_array[:, 1].astype(np.int64)
        word = (cols // TK) * TKP + (cols % TKP)
        bit = (cols % TK) // TKP
        np.bitwise_or.at(packed, (rows, word), (np.uint32(1) << bit.astype(np.uint32)))
    return packed, mp, kp


def unpack_bits_np(packed: np.ndarray) -> np.ndarray:
    """Inverse of pack_bits (host; tests/fallback)."""
    m, kp = packed.shape
    ntiles = kp // TKP
    w = packed.reshape(m, ntiles, 1, TKP)
    bits = (w >> np.arange(32, dtype=np.uint32)[None, None, :, None]) & 1
    return bits.reshape(m, ntiles * TK).astype(np.float32)


def _unpack_bits_jnp(packed: jnp.ndarray) -> jnp.ndarray:
    m, kp = packed.shape
    ntiles = kp // TKP
    w = packed.reshape(m, ntiles, 1, TKP)
    bits = (w >> jnp.arange(32, dtype=jnp.uint32)[None, None, :, None]) & jnp.uint32(1)
    return bits.reshape(m, ntiles * TK).astype(jnp.bfloat16)


# -- keep-mask ----------------------------------------------------------------


def _threshold_u8(p: float) -> int:
    """Dropout prob quantized to 1/256 steps (documented deviation: p becomes
    round(p*256)/256)."""
    return max(0, min(255, int(round(p * 256))))


def _mix_hash(seed, rows, words):
    h = (rows.astype(jnp.uint32) * _C1) ^ (words.astype(jnp.uint32) * _C2) ^ seed
    h = (h ^ (h >> 16)) * _C3
    return h ^ (h >> 16)


def _mix_base(rows, words):
    """The round-independent part of ``_mix_hash``: rows*C1 ^ words*C2.
    Hoisting it out of ``_keepword``'s 8 rounds removes 16 of the 24 u32
    multiplies per keep word (VPU int multiplies are the dropout hash's
    cost) with BIT-IDENTICAL output."""
    return (rows.astype(jnp.uint32) * _C1) ^ (words.astype(jnp.uint32) * _C2)


def _mix_finish(base, seed):
    h = base ^ seed
    h = (h ^ (h >> 16)) * _C3
    return h ^ (h >> 16)


def _salt(i: int) -> np.uint32:
    return np.uint32((i * 0x9E3779B1 + 1) & 0xFFFFFFFF)


def _keepword(seed, rows, words, thr: int):
    """32-bit keep word for a (.., TKP) grid of packed words: bit b is
    [byte(r, c) >= thr] for column c = tile_base + b*128 + lane, where
    byte(r, c)'s 8 bits are bit-sliced across 8 salted hash grids. The
    comparator runs on all 32 bit positions at once via bitwise ops."""
    ge = jnp.zeros(rows.shape, dtype=jnp.uint32)
    eq = jnp.full(rows.shape, 0xFFFFFFFF, dtype=jnp.uint32)
    base = _mix_base(rows, words)  # hoisted: identical across the 8 rounds
    for i in range(7, -1, -1):
        h = _mix_finish(base, seed + _salt(i))
        if (thr >> i) & 1:
            eq = eq & h
        else:
            ge = ge | (eq & h)
            eq = eq & (~h)
    return ge | eq


def keep_mask_dense(seed, n_rows: int, n_cols: int, p: float) -> jnp.ndarray:
    """Unpacked (n_rows, n_cols) bool keep mask — the identical decision the
    kernels make, materialized for the XLA fallback and oracle tests."""
    thr = _threshold_u8(p)
    cols = jnp.arange(n_cols, dtype=jnp.uint32)
    words = (cols // TK) * TKP + (cols % TKP)  # (C,)
    bit = ((cols % TK) // TKP).astype(jnp.uint32)  # (C,)
    rows = jnp.arange(n_rows, dtype=jnp.uint32)
    kw = _keepword(
        jnp.uint32(seed), rows[:, None], words[None, :], thr
    )  # (R, C) keep words (bit per column's plane)
    return ((kw >> bit[None, :]) & jnp.uint32(1)).astype(bool)


def _seed_from_key(key: jax.Array) -> jnp.ndarray:
    data = jax.random.key_data(key).reshape(-1)
    return (data[0] ^ data[-1]).astype(jnp.uint32)


def packed_lookup(packed: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray):
    """Membership test B[rows, cols] != 0 from the packed layout (used by the
    device-side negative sampler for O(1) positive exclusion)."""
    cols = cols.astype(jnp.uint32)
    word = (cols // TK) * TKP + (cols % TKP)
    bit = (cols % TK) // TKP
    w = packed[rows, word.astype(jnp.int32)]
    return ((w >> bit) & jnp.uint32(1)) > 0


# -- Pallas kernels -----------------------------------------------------------


def _make_fwd_kernel(masked: bool, thr: int):
    import jax.experimental.pallas as pl

    def kernel(seed_ref, w_ref, x_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = w_ref[:]
        if masked:
            i = pl.program_id(0)
            rows = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0) + i * TM
            words = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1) + j * TKP
            w = w & _keepword(seed_ref[0], rows, words, thr)
        # kept as the per-plane dot chain: a round-4 flat-dot variant
        # (concat 32 planes -> one big-K dot, KERNEL_FINDINGS.md)
        # measured faster in isolation but NEUTRAL-to-worse in-situ
        # (feat_agg_fwd_bwd 7.54 -> 7.68 ms) — the masked path is bound by
        # the keep-word hash, not dot issue, so the concat only adds VPU work
        acc = acc_ref[:]
        for b in range(32):
            bits = (
                ((w >> np.uint32(b)) & np.uint32(1))
                .astype(jnp.int32)
                .astype(jnp.bfloat16)
            )
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


def _make_bwd_kernel(masked: bool, thr: int):
    """out[K, d] = B^T @ ct via per-plane dim0-contractions; the mask grid is
    in the SAME (row, word) frame as the forward kernel, so the keep decision
    is bit-identical."""
    import jax.experimental.pallas as pl

    def kernel(seed_ref, w_ref, ct_ref, out_ref, acc_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = w_ref[:]
        if masked:
            j = pl.program_id(0)
            rows = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0) + i * TM
            words = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1) + j * TKP
            w = w & _keepword(seed_ref[0], rows, words, thr)
        ct = ct_ref[:]
        for b in range(32):
            bits = (
                ((w >> np.uint32(b)) & np.uint32(1))
                .astype(jnp.int32)
                .astype(jnp.bfloat16)
            )
            acc_ref[pl.ds(b * TKP, TKP), :] += jax.lax.dot_general(
                bits,
                ct,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(i == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kernel


def _fwd_pallas(wp, x, seed, p: float, masked: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, kp = wp.shape
    k = kp * 32
    d = x.shape[1]
    grid = (m // TM, kp // TKP)
    return pl.pallas_call(
        _make_fwd_kernel(masked, _threshold_u8(p)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, TKP), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TM, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * d,
            bytes_accessed=m * kp * 4 + k * d * 2 + m * d * 4,
            transcendentals=0,
        ),
    )(seed.reshape(1), wp, x.astype(jnp.bfloat16))


def _bwd_pallas(wp, ct, seed, p: float, masked: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, kp = wp.shape
    k = kp * 32
    d = ct.shape[1]
    grid = (kp // TKP, m // TM)  # K-tiles outer, row blocks inner
    return pl.pallas_call(
        _make_bwd_kernel(masked, _threshold_u8(p)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, TKP), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TK, d), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
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
    )(seed.reshape(1), wp, ct.astype(jnp.bfloat16))


# -- transposed-layout kernels (round 5): full-lane dots ----------------------
#
# The kernels above put the embedding dim d on the MXU's LANE (N) axis: at
# d=64 half the 128-wide result lanes idle, and the round-4 profile pinned
# the feat-aggregation step piece (4 such passes) at 52% of the train step
# (PROFILE_STEP.json, VERDICT r4 next #2). The transposed formulation puts d
# on the M (streaming) axis instead and contracts over the tile, so N is the
# 512-row / 4096-column tile axis — full lanes at ANY d:
#
#   y1t (d, m) = (B∘mask1 @ X1)^T      per tile: x1t (d, TK) · big (TM, TK)^T
#   y2t (d, K) = ((B∘mask2)^T @ X2)^T  per tile: x2t (d, TM) · big (TM, TK)
#
# where ``big`` is the tile's 32 bit-planes unpacked to a (TM, TK) bf16
# matrix — plane b occupies the contiguous lane slice [b*128, (b+1)*128)
# (the pack_bits layout), so the unpack is 32 shift/and/cast slices and the
# dot is ONE flat big-K MXU op per tile (the round-4 flat-dot lesson,
# kernels/pcache.py docstring). Both orientations stream the same packed
# tiles; masks stay in the canonical (row, word) frame so forward and
# backward drops are bit-identical.
#
# ``bbt_pair[_dropped]`` runs BOTH directions per call — exactly the shape of
# INMO's feat aggregation (reference model.py:423-432: user rows aggregate
# item templates AND item rows aggregate user templates each step) and of
# one sym-norm propagation layer (reference model.py:96-106). Its VJP is the
# same pair with the cotangents swapped across directions (and the masks
# swapped with them), so one kernel pair serves fwd and bwd.


def _unpack_tile(w: jnp.ndarray) -> jnp.ndarray:
    """(TM, TKP) packed words -> (TM, TK) bf16 0/1 tile; plane b lands in
    lanes [b*TKP, (b+1)*TKP) matching the pack_bits column layout. The cast
    routes through int32 (Mosaic has no u32 -> bf16 cast)."""
    return jnp.concatenate(
        [
            ((w >> np.uint32(b)) & np.uint32(1))
            .astype(jnp.int32)
            .astype(jnp.bfloat16)
            for b in range(32)
        ],
        axis=1,
    )


def _make_t1_kernel(masked: bool, thr: int, flat: bool):
    """y1t (d, m) += x1t-block · tile^T  (grid (i, j), accumulate over j)."""
    import jax.experimental.pallas as pl

    def kernel(seed_ref, w_ref, x1t_ref, out_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        w = w_ref[:]
        if masked:
            rows = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0) + i * TM
            words = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1) + j * TKP
            w = w & _keepword(seed_ref[0], rows, words, thr)
        if flat:
            big = _unpack_tile(w)  # (TM, TK)
            part = jax.lax.dot_general(
                x1t_ref[:], big,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d, TM)
        else:
            part = jnp.zeros_like(out_ref)
            for b in range(32):
                bits = (
                    ((w >> np.uint32(b)) & np.uint32(1))
                    .astype(jnp.int32)
                    .astype(jnp.bfloat16)
                )
                part += jax.lax.dot_general(
                    x1t_ref[:, pl.ds(b * TKP, TKP)], bits,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        @pl.when(j == 0)
        def _():
            out_ref[:] = part

        @pl.when(j > 0)
        def _():
            out_ref[:] = out_ref[:] + part

    return kernel


def _make_t2_kernel(masked: bool, thr: int, mode):
    """y2t (d, K) += x2t-block · tile  (grid (j, i), accumulate over i).
    mode: 'flat' = unpack the (TM, TK) tile then one K=TM dot; 'loopcat' =
    32 per-plane dots concatenated (skips materializing the big tile);
    'loop' = per-plane dots written to output slices."""
    import jax.experimental.pallas as pl

    flat = mode is True or mode == "flat"

    def kernel(seed_ref, w_ref, x2t_ref, out_ref):
        j, i = pl.program_id(0), pl.program_id(1)
        w = w_ref[:]
        if masked:
            rows = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0) + i * TM
            words = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1) + j * TKP
            w = w & _keepword(seed_ref[0], rows, words, thr)
        x2 = x2t_ref[:]
        if flat or mode == "loopcat":
            if flat:
                big = _unpack_tile(w)  # (TM, TK)
                part = jnp.dot(x2, big, preferred_element_type=jnp.float32)
            else:
                part = jnp.concatenate(
                    [
                        jnp.dot(
                            x2,
                            ((w >> np.uint32(b)) & np.uint32(1))
                            .astype(jnp.int32)
                            .astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32,
                        )
                        for b in range(32)
                    ],
                    axis=1,
                )

            @pl.when(i == 0)
            def _():
                out_ref[:] = part

            @pl.when(i > 0)
            def _():
                out_ref[:] = out_ref[:] + part
        else:
            for b in range(32):
                bits = (
                    ((w >> np.uint32(b)) & np.uint32(1))
                    .astype(jnp.int32)
                    .astype(jnp.bfloat16)
                )
                part = jnp.dot(x2, bits, preferred_element_type=jnp.float32)

                @pl.when(i == 0)
                def _():
                    out_ref[:, pl.ds(b * TKP, TKP)] = part

                @pl.when(i > 0)
                def _():
                    out_ref[:, pl.ds(b * TKP, TKP)] = (
                        out_ref[:, pl.ds(b * TKP, TKP)] + part
                    )

    return kernel


# Per-tile dot shape, set by the TPU microbench verdict
# (tools/microbench_dual.py, KERNEL_FINDINGS.md): t1's 32 per-plane NT dots
# (M=64, K=128, N=512) chain-accumulate in registers and beat the flat
# big-K form (1.13 vs 1.39 ms); t2's best is per-plane dots CONCATENATED
# into the accumulator (1.00 ms — skips materializing the unpacked tile;
# flat 1.13, per-plane output-slice writes serialize at 3.5 ms).
T1_FLAT = False
T2_FLAT = "loopcat"  # 'flat' | 'loopcat' | False(loop)


def _t1_pallas(wp, x1t, seed, p: float, masked: bool, interpret: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, kp = wp.shape
    k = kp * 32
    d = x1t.shape[0]
    grid = (m // TM, kp // TKP)
    return pl.pallas_call(
        _make_t1_kernel(masked, _threshold_u8(p), T1_FLAT),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, TKP), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, TK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, TM), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, m), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * d,
            bytes_accessed=m * kp * 4 + k * d * 2 + m * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seed.reshape(1), wp, x1t.astype(jnp.bfloat16))


def _t2_pallas(wp, x2t, seed, p: float, masked: bool, interpret: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, kp = wp.shape
    k = kp * 32
    d = x2t.shape[0]
    grid = (kp // TKP, m // TM)
    return pl.pallas_call(
        _make_t2_kernel(masked, _threshold_u8(p), T2_FLAT),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, TKP), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, TM), lambda j, i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, TK), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * d,
            bytes_accessed=m * kp * 4 + m * d * 2 + k * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seed.reshape(1), wp, x2t.astype(jnp.bfloat16))


def _t_xla(wp, x1t, x2t, seed1, seed2, p: float, masked: bool):
    """XLA fallback: identical unpacked matrix + identical keep decisions.
    Inputs are ROUNDED to bf16 then dotted in f32 — bit-equal products to the
    TPU kernels' bf16 x bf16 -> f32 MXU dots (0/1 entries and bf16 values are
    exact in f32; accumulation is f32 in both), and the CPU executor lacks a
    transposed bf16 DotThunk."""
    b = _unpack_bits_jnp(wp).astype(jnp.float32)
    m, k = b.shape
    b1 = b2 = b
    if masked:
        b1 = jnp.where(keep_mask_dense(seed1, m, k, p), b, 0.0)
        b2 = jnp.where(keep_mask_dense(seed2, m, k, p), b, 0.0)
    x1f = x1t.astype(jnp.bfloat16).astype(jnp.float32)
    x2f = x2t.astype(jnp.bfloat16).astype(jnp.float32)
    y1t = jax.lax.dot_general(
        x1f, b1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y2t = jnp.dot(x2f, b2, preferred_element_type=jnp.float32)
    return y1t, y2t


def _t_dispatch(wp, x1t, x2t, seed1, seed2, p, masked):
    m, kp = wp.shape
    if jax.default_backend() == "tpu" and m % TM == 0 and kp % TKP == 0:
        y1t = _t1_pallas(wp, x1t, seed1, p, masked)
        y2t = _t2_pallas(wp, x2t, seed2, p, masked)
        return y1t, y2t
    return _t_xla(wp, x1t, x2t, seed1, seed2, p, masked)


def mask_words(wp: jnp.ndarray, key: jax.Array, p: float) -> jnp.ndarray:
    """Packed words with the coordinate-hashed keep mask APPLIED:
    ``wp & keepword(seed, row, word)`` over the full (m, kp) grid — the
    identical keep decision the in-kernel masked paths make (same frame,
    same ``_keepword``), materialized once. Rationale (round-5 microbench,
    tools/microbench_dual.py): the 8-round keep-word hash costs ~2x the
    unmasked dot pass itself, and a train step re-ran it in all four masked
    passes (fwd x2, bwd x2). Building the masked operand once per direction
    (~161 MB extra HBM at Gowalla scale, transient) lets every dot run as a
    fast unmasked flat pass and halves the total hash work."""
    m, kp = wp.shape
    seed = _seed_from_key(key)
    rows = jax.lax.broadcasted_iota(jnp.uint32, (m, kp), 0)
    words = jax.lax.broadcasted_iota(jnp.uint32, (m, kp), 1)
    return wp & _keepword(seed, rows, words, _threshold_u8(p))


def mask_words_hw(wp: jnp.ndarray, key: jax.Array, p: float) -> jnp.ndarray:
    """TPU variant of ``mask_words`` drawing the 8 bit-sliced comparator
    grids from the hardware PRNG (``pltpu.prng_random_bits``) instead of
    the multiply-xorshift hash: 0.56 vs 3.08 ms per STANDALONE
    Gowalla-scale build (r5 probe). Kept as a documented NEGATIVE result
    for the training path: wired into feat_aggregate it REGRESSED the step
    (9.75 -> 10.18 ms; bench 208.3k -> 197.5k int/s) — the extra Pallas
    launch boundaries cost more than the hash's XLA-fused build, so the
    hash `mask_words` remains the shipped premask builder
    (KERNEL_FINDINGS.md). Deterministic per (key, tile) on a given TPU
    generation but a DIFFERENT stream than the hash/CPU; same keep
    probability (1 - round(p*256)/256), pinned by the probe's population
    count."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    thr = _threshold_u8(p)
    m, kp = wp.shape
    assert m % TM == 0 and kp % TKP == 0

    def kernel(seed_ref, w_ref, out_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        # single combined scalar: Mosaic rejects multi-operand prng_seed
        # with program_id-derived operands ("UNKNOWN SSA VALUE")
        tile_seed = (
            seed_ref[0]
            ^ (jnp.uint32(i) * _C1)
            ^ (jnp.uint32(j) * _C2)
        )
        pltpu.prng_seed(tile_seed)
        shape = w_ref.shape
        ge = jnp.zeros(shape, jnp.uint32)
        eq = jnp.full(shape, 0xFFFFFFFF, jnp.uint32)
        for b in range(7, -1, -1):
            h = pltpu.prng_random_bits(shape)
            if h.dtype != jnp.uint32:
                h = jax.lax.bitcast_convert_type(h, jnp.uint32)
            if (thr >> b) & 1:
                eq = eq & h
            else:
                ge = ge | (eq & h)
                eq = eq & (~h)
        out_ref[:] = w_ref[:] & (ge | eq)

    return pl.pallas_call(
        kernel,
        grid=(m // TM, kp // TKP),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, TKP), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TKP), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, kp), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(_seed_from_key(key).reshape(1), wp)


def _t1_unmasked(wp, x1t):
    m, kp = wp.shape
    if jax.default_backend() == "tpu" and m % TM == 0 and kp % TKP == 0:
        return _t1_pallas(wp, x1t, jnp.uint32(0), 0.0, False)
    b = _unpack_bits_jnp(wp).astype(jnp.float32)
    return jax.lax.dot_general(
        x1t.astype(jnp.bfloat16).astype(jnp.float32), b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _t2_unmasked(wp, x2t):
    m, kp = wp.shape
    if jax.default_backend() == "tpu" and m % TM == 0 and kp % TKP == 0:
        return _t2_pallas(wp, x2t, jnp.uint32(0), 0.0, False)
    b = _unpack_bits_jnp(wp).astype(jnp.float32)
    return jnp.dot(
        x2t.astype(jnp.bfloat16).astype(jnp.float32), b,
        preferred_element_type=jnp.float32,
    )


@jax.custom_vjp
def bbt_pair_premasked(w1, w2, x1t, x2t):
    """Transposed-layout pair over PRE-MASKED packed operands: y1t (d, m) =
    (W1 @ x1t^T)^T, y2t (d, K) = (W2^T @ x2t^T)^T, where W1/W2 are
    ``mask_words`` outputs (or any packed matrices). The backward swaps the
    directions AND the operands with them — no hash anywhere in the four
    dots. This is feat_aggregate's training path (kernels/dense_graph.py)."""
    return _t1_unmasked(w1, x1t), _t2_unmasked(w2, x2t)


def _bbtp_fwd(w1, w2, x1t, x2t):
    return bbt_pair_premasked(w1, w2, x1t, x2t), (w1, w2)


def _bbtp_bwd(res, cts):
    w1, w2 = res
    dy1t, dy2t = cts
    # dx1t (d, K) = dy1t @ W1  (t2-orientation on W1);
    # dx2t (d, m) = (W2 @ dy2t^T)^T  (t1-orientation on W2)
    dx1t = _t2_unmasked(w1, dy1t)
    dx2t = _t1_unmasked(w2, dy2t)
    return (None, None, dx1t.astype(jnp.float32), dx2t.astype(jnp.float32))


bbt_pair_premasked.defvjp(_bbtp_fwd, _bbtp_bwd)


@jax.custom_vjp
def bbt_pair(wp, x1t, x2t):
    """Unmasked pair: y1t (d, m) = (B @ x1t^T)^T, y2t (d, K) = (B^T @ x2t^T)^T
    — both directions of the bit-packed operator in transposed layout."""
    return _t_dispatch(wp, x1t, x2t, jnp.uint32(0), jnp.uint32(0), 0.0, False)


def _bbt_fwd(wp, x1t, x2t):
    return bbt_pair(wp, x1t, x2t), (wp,)


def _bbt_bwd(res, cts):
    (wp,) = res
    dy1t, dy2t = cts
    # swap directions: dx2t (d, m) = (B @ dy2t^T)^T, dx1t (d, K) = dy1t @ B
    dx2t, dx1t = _t_dispatch(
        wp, dy2t, dy1t, jnp.uint32(0), jnp.uint32(0), 0.0, False
    )
    return (None, dx1t.astype(jnp.float32), dx2t.astype(jnp.float32))


bbt_pair.defvjp(_bbt_fwd, _bbt_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def bbt_pair_dropped(wp, x1t, x2t, key1, key2, p: float):
    """Masked pair WITHOUT the 1/(1-p) rescale: direction 1 drops with
    ``key1``, direction 2 with ``key2`` (independent edge sets, reference
    model.py:435 — the feat matrix's user-side and item-side blocks each get
    their own keeps). Coordinate-hashed masks: the backward regenerates
    bit-identical drops from the same seeds."""
    s1, s2 = _seed_from_key(key1), _seed_from_key(key2)
    return _t_dispatch(wp, x1t, x2t, s1, s2, p, True)


def _bbtd_fwd(wp, x1t, x2t, key1, key2, p):
    s1, s2 = _seed_from_key(key1), _seed_from_key(key2)
    out = _t_dispatch(wp, x1t, x2t, s1, s2, p, True)
    return out, (wp, s1, s2)


def _bbtd_bwd(p, res, cts):
    wp, s1, s2 = res
    dy1t, dy2t = cts
    # swapped directions carry their ORIGINAL masks with them: direction-1's
    # cotangent flows through mask1 (now applied on the dir-2 orientation)
    dx2t, dx1t = _t_dispatch(wp, dy2t, dy1t, s2, s1, p, True)
    return (None, dx1t.astype(jnp.float32), dx2t.astype(jnp.float32),
            None, None)


bbt_pair_dropped.defvjp(_bbtd_fwd, _bbtd_bwd)


# -- XLA fallback -------------------------------------------------------------


def _mm_xla(wp, x, seed, p: float, masked: bool, transpose: bool):
    b = _unpack_bits_jnp(wp)
    m, k = b.shape
    if masked:
        keep = keep_mask_dense(seed, m, k, p)
        b = jnp.where(keep, b, jnp.bfloat16(0.0))
    if transpose:
        return jax.lax.dot_general(
            b, x.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(b, x.astype(jnp.bfloat16), preferred_element_type=jnp.float32)


def _dispatch(wp, x, seed, p, masked, transpose):
    m, kp = wp.shape
    if jax.default_backend() == "tpu" and m % TM == 0 and kp % TKP == 0:
        if transpose:
            return _bwd_pallas(wp, x, seed, p, masked)
        return _fwd_pallas(wp, x, seed, p, masked)
    return _mm_xla(wp, x, seed, p, masked, transpose)


# -- public ops with custom VJPs ----------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def bb_matmul(wp, x, transpose: bool = False):
    """B @ x (or B^T @ x) with 1-bit-packed B; x grads flow through the
    opposite-orientation kernel over the same packed tiles."""
    return _dispatch(wp, x, jnp.uint32(0), 0.0, masked=False, transpose=transpose)


def _bb_fwd(wp, x, transpose):
    return bb_matmul(wp, x, transpose), (wp,)


def _bb_bwd(transpose, res, ct):
    (wp,) = res
    dx = _dispatch(wp, ct, jnp.uint32(0), 0.0, masked=False,
                   transpose=not transpose)
    return (None, dx.astype(jnp.float32))


bb_matmul.defvjp(_bb_fwd, _bb_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bb_matmul_dropped(wp, x, key, p: float, transpose: bool = False):
    """(B ∘ keep-mask(key, p)) @ x (or transposed), WITHOUT the 1/(1-p)
    rescale (callers fold the uniform scalar). The mask is coordinate-hashed,
    so forward and backward see bit-identical drops."""
    seed = _seed_from_key(key)
    return _dispatch(wp, x, seed, p, masked=True, transpose=transpose)


def _bbd_fwd(wp, x, key, p, transpose):
    seed = _seed_from_key(key)
    out = _dispatch(wp, x, seed, p, masked=True, transpose=transpose)
    return out, (wp, seed)


def _bbd_bwd(p, transpose, res, ct):
    wp, seed = res
    dx = _dispatch(wp, ct, seed, p, masked=True, transpose=not transpose)
    return (None, dx.astype(jnp.float32), None)


bb_matmul_dropped.defvjp(_bbd_fwd, _bbd_bwd)
