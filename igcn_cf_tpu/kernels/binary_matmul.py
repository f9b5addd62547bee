"""Int8 binary matmul kernels: Y = B @ X and Y = (B ∘ M) @ X on the MXU.

The graph matrices are binary, so they are stored int8 (0/1) — HALF the HBM
traffic of bf16, which is what the step time is made of. For the PLAIN
matmul XLA's convert(int8->bf16)+dot streams at full HBM bandwidth (766 GB/s
measured, tools/microbench_tiles2.py), so no kernel is needed; the Pallas
kernel exists for the DROPOUT-fused variant, where XLA would have to
materialize a multi-GB masked copy of B every step.

Dropout masking reuses the coordinate-hash design of masked_matmul.py: the
mask is a counter-based hash of GLOBAL (row, col) coordinates, so the
backward pass over the pre-stored transpose regenerates the bit-identical
mask with swapped coordinate roles — no random-stream transposition, no
extra HBM traffic. See that module's docstring for the exactness argument.

Grid: (M/TM, K/TK) with the K axis innermost; the f32 output block stays
resident in VMEM across the K sweep and accumulates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from igcn_cf_tpu.kernels.masked_matmul import (
    _keep_mask,
    _mix_hash,
    _seed_from_key,
    _threshold_u8,
)

# tuned on TPU v5e at Gowalla scale (tools/microbench_tiles2.py): 512x1024
# hits 513 GB/s in-kernel; the plain (unmasked) path doesn't use Pallas at
# all — XLA's convert(int8->bf16)+dot streams at full HBM bandwidth
# (766 GB/s), beating every hand tile
TILE_M = 512
TILE_K = 1024


def _make_kernel(p: float, swap: bool, masked: bool, tm: int, tk: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, b_ref, x_ref, out_ref):
        j = pl.program_id(1)
        a = b_ref[:].astype(jnp.bfloat16)
        if masked:
            # byte-packed quadrant mask (masked_matmul.PACK_* geometry): one
            # (., QB) hash grid serves the tile's four canonical-column
            # quadrants with a static byte index per quadrant
            from igcn_cf_tpu.kernels.masked_matmul import PACK_QB, PACK_TB

            i = pl.program_id(0)
            seed = seed_ref[0]
            thr = _threshold_u8(p)
            if not swap:
                # canonical cols = tile cols; tk == PACK_TB (asserted in
                # _mm_pallas), so the tile spans exactly one TB block
                rows_s = (
                    jax.lax.broadcasted_iota(jnp.int32, (tm, PACK_QB), 0) + i * tm
                )
                words_s = (
                    jax.lax.broadcasted_iota(jnp.int32, (tm, PACK_QB), 1)
                    + j * PACK_QB
                )
                h = _mix_hash(seed, rows_s, words_s)
                quarters = []
                for q in range(4):
                    keep = ((h >> np.uint32(8 * q)) & np.uint32(0xFF)) >= thr
                    sl = a[:, q * PACK_QB : (q + 1) * PACK_QB]
                    quarters.append(jnp.where(keep, sl, jnp.bfloat16(0.0)))
                a = jnp.concatenate(quarters, axis=1)
            else:
                # canonical rows = tile COLUMN ids; canonical cols = tile ROW
                # ids C = i*tm + r with tm == PACK_TB//2: the tile covers two
                # QB row-halves of TB block i//2, at byte offset (i%2)*2
                half = tm // 2  # == PACK_QB
                cols_s = (
                    jax.lax.broadcasted_iota(jnp.int32, (half, tk), 1) + j * tk
                )
                words_s = jax.lax.broadcasted_iota(jnp.int32, (half, tk), 0) + (
                    i // 2
                ) * PACK_QB
                h = _mix_hash(seed, cols_s, words_s)
                base = np.uint32(16) * (i % 2).astype(jnp.uint32)
                halves = []
                for q in range(2):
                    shift = base + np.uint32(8 * q)
                    keep = ((h >> shift) & np.uint32(0xFF)) >= thr
                    sl = a[q * half : (q + 1) * half, :]
                    halves.append(jnp.where(keep, sl, jnp.bfloat16(0.0)))
                a = jnp.concatenate(halves, axis=0)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += jnp.dot(a, x_ref[:], preferred_element_type=jnp.float32)

    return kernel


def _mm_pallas(b, x, seed, p: float, swap: bool, masked: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = b.shape
    d = x.shape[1]
    assert m % TILE_M == 0 and k % TILE_K == 0, (m, k)
    grid = (m // TILE_M, k // TILE_K)
    flops = 2 * m * k * d
    return pl.pallas_call(
        _make_kernel(p, swap, masked, TILE_M, TILE_K),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_M, TILE_K), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_K, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=m * k + k * d * 2 + m * d * 4,
            transcendentals=0,
        ),
    )(seed.reshape(1), b, x.astype(jnp.bfloat16))


def _mm_xla(b, x, seed, p: float, swap: bool, masked: bool):
    m, k = b.shape
    a = b.astype(jnp.bfloat16)
    if masked:
        if swap:
            rows = jax.lax.broadcasted_iota(jnp.int32, (m, k), 1)
            cols = jax.lax.broadcasted_iota(jnp.int32, (m, k), 0)
        else:
            rows = jax.lax.broadcasted_iota(jnp.int32, (m, k), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (m, k), 1)
        a = jnp.where(_keep_mask(seed, rows, cols, p), a, jnp.bfloat16(0.0))
    return jnp.dot(a, x.astype(jnp.bfloat16), preferred_element_type=jnp.float32)


def _dispatch(b, x, seed, p, swap, masked, lean=False):
    # Plain matmul: XLA's convert+dot measured fastest in the full train step
    # (27.6k vs 30.9k examples/s with the Pallas plain kernel) BUT it hoists
    # a bf16 copy of B out of epoch scans (~2x extra HBM residency). ``lean``
    # forces the Pallas kernel for plain matmuls too — ~25% slower, no bf16
    # copy — for catalogs that only fit as int8 (dense_graph.choose_backend).
    # The masked path is always Pallas (XLA would materialize a multi-GB
    # masked copy per step). Non-tile-divisible shapes (small shard blocks)
    # fall back to XLA.
    m, k = b.shape
    if (
        (masked or lean)
        and jax.default_backend() == "tpu"
        and m % TILE_M == 0
        and k % TILE_K == 0
    ):
        return _mm_pallas(b, x, seed, p, swap, masked)
    return _mm_xla(b, x, seed, p, swap, masked)


_ZERO_SEED = np.uint32(0)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def binary_matmul(b, bt, x, lean: bool = False):
    """B @ x with int8 B; backward uses the pre-stored transpose."""
    return _dispatch(b, x, jnp.uint32(0), 0.0, swap=False, masked=False, lean=lean)


def _bm_fwd(b, bt, x, lean):
    return binary_matmul(b, bt, x, lean), (bt,)


def _bm_bwd(lean, res, ct):
    (bt,) = res
    dx = _dispatch(bt, ct, jnp.uint32(0), 0.0, swap=True, masked=False, lean=lean)
    return (None, None, dx.astype(jnp.float32))


binary_matmul.defvjp(_bm_fwd, _bm_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def binary_matmul_dropped(b, bt, x, key, p: float):
    """(B ∘ keep-mask(key)) @ x, WITHOUT the 1/(1-p) rescale (callers fold
    the uniform scalar)."""
    seed = _seed_from_key(key)
    return _dispatch(b, x, seed, p, swap=False, masked=True)


def _bmd_fwd(b, bt, x, key, p):
    seed = _seed_from_key(key)
    return _dispatch(b, x, seed, p, swap=False, masked=True), (bt, seed)


def _bmd_bwd(p, res, ct):
    bt, seed = res
    dx = _dispatch(bt, ct, seed, p, swap=True, masked=True)
    return (None, None, dx.astype(jnp.float32), None)


binary_matmul_dropped.defvjp(_bmd_fwd, _bmd_bwd)
