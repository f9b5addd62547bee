"""Fused dropout-masked dense matmul: Y = (B ∘ M) @ X on the MXU.

This is the Pallas kernel behind edge dropout in the dense graph engine
(kernels/dense_graph.py): the reference drops each sparse edge independently
and rescales survivors (reference model.py:263-275); in dense form that is a
Bernoulli mask over the binary matrix's entries (masking structural zeros is
a no-op). Materializing the masked copy would double HBM traffic on a
multi-GB matrix every training step — instead the mask is generated INSIDE
the matmul kernel from a counter-based hash of the global (row, col)
coordinates, so it costs a few VPU ops per tile and zero extra HBM traffic.

The coordinate hash (not a sequential PRNG stream) is what makes the custom
VJP exact: the backward pass computes dX = (B ∘ M)ᵀ @ ct by running the SAME
kernel over the pre-stored transpose BT with swapped coordinate roles —
bit-identical mask, no transposition of a random stream.

The rescale 1/(1-p) is uniform, so it is folded outside as a scalar multiply.

On non-TPU backends (unit tests run on a CPU mesh) a pure-XLA fallback
materializes the identical hash mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TILE_M = 256
TILE_K = 512

# multiply-xorshift mixing constants (splitmix64/wyhash-style finalizer on u32)
_C1 = np.uint32(0x9E3779B9)
_C2 = np.uint32(0x85EBCA6B)
_C3 = np.uint32(0xC2B2AE35)


def _mix_hash(seed: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """Counter-based u32 hash of (seed, row, col); symmetric role handling is
    done by the caller passing (rows, cols) in canonical B orientation.
    Two mix rounds — enough bit diffusion for dropout marginals, and the hash
    runs on the VPU inside the matmul kernel where every op counts."""
    h = (rows.astype(jnp.uint32) * _C1) ^ (cols.astype(jnp.uint32) * _C2) ^ seed
    h = (h ^ (h >> 16)) * _C3
    h = h ^ (h >> 16)
    return h


def _threshold_u8(p: float) -> np.uint32:
    """Dropout prob quantized to 1/256 steps (documented deviation: p becomes
    round(p*256)/256 — e.g. 0.3 -> 0.30078)."""
    return np.uint32(max(0, min(255, int(round(p * 256)))))


# Byte-packing geometry: the canonical column space is viewed in TB-wide
# blocks split into 4 QB-wide quadrants; entry (r, C) reads byte
# (C % TB) // QB of hash word ((C // TB) * QB + C % QB, r). Within one
# aligned (.., TB) kernel tile the four quadrants share ONE (.., QB) hash
# grid with a STATIC byte index per quadrant — 4x less hash work and no
# per-element byte selector on the VPU.
PACK_TB = 1024
PACK_QB = PACK_TB // 4


def _keep_mask(seed, rows, cols, p: float) -> jnp.ndarray:
    """Byte-packed keep mask as a pure function of canonical global
    coordinates — the identical formula backs the XLA fallback, the Pallas
    forward tile and the transposed backward tile. Keep iff byte >= p*256 —
    the reference's keep-when-rand>=p semantics (reference model.py:266-268)
    with p quantized to 1/256."""
    cols = cols.astype(jnp.uint32)
    word = (cols // np.uint32(PACK_TB)) * np.uint32(PACK_QB) + (
        cols % np.uint32(PACK_QB)
    )
    byte_sel = (cols % np.uint32(PACK_TB)) // np.uint32(PACK_QB)
    h = _mix_hash(seed, rows, word)
    byte = (h >> (np.uint32(8) * byte_sel)) & np.uint32(0xFF)
    return byte >= _threshold_u8(p)


def _seed_from_key(key: jax.Array) -> jnp.ndarray:
    data = jax.random.key_data(key).reshape(-1)
    return (data[0] ^ data[-1]).astype(jnp.uint32)


# -- Pallas kernel -----------------------------------------------------------


def _make_kernel(p: float, swap: bool, tm: int, tk: int):
    import jax.experimental.pallas as pl

    def kernel(seed_ref, b_ref, x_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (tm, tk), 0) + i * tm
        cols = jax.lax.broadcasted_iota(jnp.int32, (tm, tk), 1) + j * tk
        if swap:  # operating on BT: canonical B coords are (col, row)
            rows, cols = cols, rows
        keep = _keep_mask(seed_ref[0], rows, cols, p)
        a = jnp.where(keep, b_ref[:], jnp.bfloat16(0.0))

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += jnp.dot(
            a, x_ref[:], preferred_element_type=jnp.float32
        )

    return kernel


def _masked_mm_pallas(b, x, seed, p: float, swap: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = b.shape
    d = x.shape[1]
    assert m % TILE_M == 0 and k % TILE_K == 0, (m, k)
    grid = (m // TILE_M, k // TILE_K)
    return pl.pallas_call(
        _make_kernel(p, swap, TILE_M, TILE_K),
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
    )(seed.reshape(1), b, x.astype(jnp.bfloat16))


def _masked_mm_xla(b, x, seed, p: float, swap: bool):
    m, k = b.shape
    if swap:
        rows = jax.lax.broadcasted_iota(jnp.int32, (m, k), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (m, k), 0)
    else:
        rows = jax.lax.broadcasted_iota(jnp.int32, (m, k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (m, k), 1)
    keep = _keep_mask(seed, rows, cols, p)
    a = jnp.where(keep, b, jnp.bfloat16(0.0))
    return jnp.dot(a, x.astype(jnp.bfloat16), preferred_element_type=jnp.float32)


def _dispatch(b, x, seed, p, swap):
    if jax.default_backend() == "tpu":
        return _masked_mm_pallas(b, x, seed, p, swap)
    return _masked_mm_xla(b, x, seed, p, swap)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def dropped_matmul(b, bt, x, key, p: float):
    """(B ∘ Bernoulli_keep(key, 1-p)) @ x, WITHOUT the 1/(1-p) rescale (the
    caller folds the uniform scale). ``bt`` is the pre-stored transpose used
    by the backward pass; b has no gradient."""
    seed = _seed_from_key(key)
    return _dispatch(b, x, seed, p, swap=False)


def _fwd(b, bt, x, key, p):
    seed = _seed_from_key(key)
    return _dispatch(b, x, seed, p, swap=False), (bt, seed)


def _bwd(p, res, ct):
    bt, seed = res
    dx = _dispatch(bt, ct, seed, p, swap=True)
    return (None, None, dx.astype(jnp.float32), None)


dropped_matmul.defvjp(_fwd, _bwd)
