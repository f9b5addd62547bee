"""Fused full-catalog retrieval kernel: score + mask + exact top-k in ONE
Pallas pass, never materializing the (n_users, n_items) score matrix in HBM.

The round-4 eval path (single-dispatch ``lax.scan`` over user blocks,
evaluation/evaluate.py) still pays the XLA decomposition per block: write
the (B, n_items) score matrix to HBM (84 MB at Gowalla scale), re-read it
for the exclusion scatter, re-read it for ``lax.top_k`` — and ``lax.top_k``
itself is a sort-grade op ~30x the one-pass HBM floor (measured ~430 ms of
a ~715 ms eval; tools/microbench_topk.py, tools/bench_eval.py).

This kernel fuses the whole per-block retrieval (reference protocol:
trainer.py:140-166 — score, mask train/val + banned, top-k):

    grid (user_block i, item_chunk j), scratch acc_(vals|idx) (B, 128):
      scores = U_i (B, d) @ I_j (d, L)                       [MXU]
      scores += banned_j (broadcast row: -BIG on banned/padding items)
      scores  = where(excl_bits_ij, -BIG, scores)            [packed u32]
      chunk   = top_k(scores)   — K rounds over the CHUNK only (phase A)
      acc     = merge(acc, chunk) — K rounds over 256 lanes   (phase B)

    HBM traffic: items_rep read once per user block + the tiny exclusion
    words; scores live only in VMEM/vregs.

Exact top-k without per-row gathers. Phase A round: the next value is
``m = max(scores)`` and its position ``pos = min(where(scores == m,
iota))`` — the winner is a single position, so eviction is one
``iota == pos`` select; position order IS global-id order within a chunk,
so ties resolve lowest-item-id-first. Phase B merges the accumulator with
the chunk's sorted list by the same (max value, min global id) rounds at
256-lane width. Equal to one K-round pass over the full concat (top-k of a
union is within the union of top-k's, and both phases use the same tie
rule), at ~2/3 the VPU cost — the rounds were the eval kernel's dominant
term (KERNEL_FINDINGS.md). Ties on equal scores resolve
lowest-item-id-first, matching lax.top_k; like the two-stage evaluator, an
item tied beyond rank K inside one chunk can differ from the flat sort's
arbitrary choice among equal values.

Exclusion masks arrive as packed little-endian u32 words (item c -> word
c//32 bit c%32, ``pack_exclusion_words``): 2 orders of magnitude smaller
HBM footprint than a dense mask (153 MB vs 4.9 GB f32 at Gowalla scale)
and built once per dataset+split.

Reference being replaced: trainer.py:149-163 (python mask loop +
torch.topk).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BU = 512  # users per block
LI = 4096  # items per chunk; LI/32 = 128 (the exclusion-word block's lane
#            dim must be a multiple of 128 for Mosaic tiling)
KPAD = 128  # top-k lane padding (k <= KPAD)
# python literals, NOT jnp scalars: traced jnp constants captured by a
# pallas kernel closure are rejected ("captures constants")
NEG = -3.0e38  # effective -inf that survives arithmetic
BIGI = 2**30


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def pack_exclusion_words(exclude_lists, n_users: int, n_items: int,
                        n_items_pad: int, user_chunk: int = 8192,
                        li: int = None) -> np.ndarray:
    """(n_users, n_items_pad/32) uint32 in PER-CHUNK BIT-PLANE layout: item
    c -> chunk j = c // li, plane b = (c % li) // (li/32), word
    w = (c % li) % (li/32); stored at column j*(li/32) + w, bit b. Planes
    unpack to CONTIGUOUS lane slices in-kernel (Mosaic rejects the
    interleaved little-endian layout's (B, W, 32) -> (B, L) shape cast).
    ``exclude_lists`` is a list of per-user item iterables; packs in user
    slabs to bound the dense bool intermediate."""
    li = li or LI
    lw = li // 32
    assert n_items_pad % li == 0
    nj = n_items_pad // li
    out = np.zeros((n_users, nj * lw), dtype=np.uint32)
    for lo in range(0, n_users, user_chunk):
        hi = min(lo + user_chunk, n_users)
        dense = np.zeros((hi - lo, n_items_pad), dtype=np.uint8)
        rows, cols = [], []
        for u in range(lo, hi):
            items = exclude_lists[u]
            if len(items):
                rows.append(np.full(len(items), u - lo, dtype=np.int64))
                cols.append(np.asarray(items, dtype=np.int64))
        if rows:
            dense[np.concatenate(rows), np.concatenate(cols)] = 1
        # (B, nj, 32 planes, lw) -> bits along the plane axis, little-first
        d4 = dense.reshape(hi - lo, nj, 32, lw).transpose(0, 1, 3, 2)
        packed = np.packbits(d4, axis=3, bitorder="little")  # (B, nj, lw, 4)
        out[lo:hi] = (
            packed.view(np.uint32)[..., 0].reshape(hi - lo, nj * lw)
        )
    return out


def pack_exclusion_words_device(user_ids, item_ids, n_users: int,
                                n_items_pad: int, li: int = None):
    """Device-side packing of the SAME bit-plane layout as
    ``pack_exclusion_words``: H2D moves only the (nnz,) interaction id
    arrays (~MBs) instead of the packed matrix (~170 MB at Gowalla scale
    over the remote-TPU tunnel), and the scatter runs on-chip. The scatter
    ADDS powers of two, which equals bitwise-or only for UNIQUE (user, item)
    pairs — callers legitimately feed concatenations that can repeat a pair
    (e.g. train[u]+val[u] slices, or serve's exclude='all' union), and one
    duplicate would carry into an adjacent bit, silently flipping another
    item's exclusion (ADVICE r4 #1). Dedupe here, on the host id arrays
    (they arrive as numpy; int64 keys sidestep the device's disabled x64).
    Returns (n_users, n_items_pad/32) uint32."""
    li = li or LI
    lw = li // 32
    assert n_items_pad % li == 0
    n_words = (n_items_pad // li) * lw
    uniq = np.unique(
        np.asarray(user_ids, np.int64) * np.int64(n_items_pad)
        + np.asarray(item_ids, np.int64)
    )
    u = jnp.asarray(uniq // n_items_pad, jnp.int32)
    it = jnp.asarray(uniq % n_items_pad, jnp.int32)
    j, r = it // li, it % li
    b, w = r // lw, r % lw
    word_col = j * lw + w
    vals = jnp.uint32(1) << b.astype(jnp.uint32)
    return (
        jnp.zeros((n_users, n_words), jnp.uint32)
        .at[u, word_col]
        .add(vals, mode="drop")
    )


def _unpack_mask(words, lanes: int):
    """(B, lw) u32 chunk block -> (B, 32*lw) bool: plane b occupies the
    contiguous lane slice [b*lw, (b+1)*lw) (bit-plane layout above)."""
    planes = [
        ((words >> np.uint32(b)) & np.uint32(1)) > 0 for b in range(32)
    ]
    return jnp.concatenate(planes, axis=1)


def _merge_topk(acc_vals, acc_idx, scores, idx, k: int):
    """Exact top-k of the candidate union [acc | scores] by K rounds of
    (max value, min index among ties) reductions. Returns (B, KPAD)."""
    bsz = scores.shape[0]
    cand_v = jnp.concatenate([acc_vals, scores], axis=1)
    cand_i = jnp.concatenate([acc_idx, idx], axis=1)
    new_v = jnp.full((bsz, KPAD), NEG, jnp.float32)
    new_i = jnp.full((bsz, KPAD), BIGI, jnp.int32)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (bsz, KPAD), 1)
    for t in range(k):
        m = jnp.max(cand_v, axis=1, keepdims=True)
        at_max = cand_v == m
        sel = jnp.min(jnp.where(at_max, cand_i, BIGI), axis=1, keepdims=True)
        hit = at_max & (cand_i == sel)
        cand_v = jnp.where(hit, NEG, cand_v)
        new_v = jnp.where(kiota == t, m, new_v)
        new_i = jnp.where(kiota == t, sel, new_i)
    return new_v, new_i


def _chunk_topk(scores, j: int, k: int):
    """Exact top-k of ONE chunk's scores by K rounds over the chunk only.
    Tie rule: lowest position (= lowest global item id within the chunk)
    first — a round's winner is a single POSITION, so the eviction is one
    ``iota == pos`` select instead of the value+id masking dance. Returns
    sorted-descending (B, KPAD) (value, global id) lists. Round-5 cost cut:
    the previous kernel ran its k rounds over concat(acc, scores) — ~9
    full-width ops on 4224 lanes per round; this runs ~6 ops on the 4096
    chunk lanes, and the acc merge happens on two short sorted lists
    (``_merge_topk`` at 256 lanes)."""
    bsz, li = scores.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    out_v = jnp.full((bsz, KPAD), NEG, jnp.float32)
    out_i = jnp.full((bsz, KPAD), BIGI, jnp.int32)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (bsz, KPAD), 1)
    for t in range(k):
        m = jnp.max(scores, axis=1, keepdims=True)
        pos = jnp.min(
            jnp.where(scores == m, iota, BIGI), axis=1, keepdims=True
        )
        scores = jnp.where(iota == pos, NEG, scores)
        out_v = jnp.where(kiota == t, m, out_v)
        out_i = jnp.where(kiota == t, pos + j * li, out_i)
    return out_v, out_i


def _fused_kernel(k: int):
    import jax.experimental.pallas as pl

    def kernel(u_ref, it_ref, ex_ref, banned_ref, out_ref, acc_v, acc_i):
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            acc_v[:] = jnp.full_like(acc_v, NEG)
            acc_i[:] = jnp.full_like(acc_i, BIGI)

        scores = jnp.dot(
            u_ref[:], it_ref[:], preferred_element_type=jnp.float32
        )  # (BU, LI)
        scores = scores + banned_ref[:]  # -BIG rows: banned + padding items
        mask = _unpack_mask(ex_ref[:], scores.shape[1])
        scores = jnp.where(mask, NEG, scores)
        # two-phase exact merge: chunk-local k rounds (cheap position-based
        # eviction), then a 256-lane sorted-list merge with the accumulator
        cv, ci = _chunk_topk(scores, j, k)
        nv, ni = _merge_topk(acc_v[:], acc_i[:], cv, ci, k)
        acc_v[:] = nv
        acc_i[:] = ni

        @pl.when(j == nj - 1)
        def _():
            out_ref[:] = acc_i[:]

    return kernel


@partial(jax.jit, static_argnames=("k", "interpret", "bu", "li"))
def fused_topk_ids(users_rep, items_t, excl_words, banned_row, *, k: int,
                   interpret: bool = False, bu: int = BU, li: int = LI):
    """Top-k item ids for every user, fused (see module docstring).

    users_rep  (n_users_pad, d) f32, n_users_pad % BU == 0
    items_t    (d, n_items_pad) f32, n_items_pad % LI == 0 (zero-padded)
    excl_words (n_users_pad, n_items_pad/32) u32 packed exclusion bits
    banned_row (1, n_items_pad) f32: 0 or NEG (banned and padding items)
    -> (n_users_pad, k) int32
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_users_pad, d = users_rep.shape
    n_items_pad = items_t.shape[1]
    assert n_users_pad % bu == 0 and n_items_pad % li == 0
    assert 0 < k <= KPAD
    ni, nj = n_users_pad // bu, n_items_pad // li

    out = pl.pallas_call(
        _fused_kernel(k),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((bu, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, li), lambda i, j: (0, j)),
            pl.BlockSpec((bu, li // 32), lambda i, j: (i, j)),
            pl.BlockSpec((1, li), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bu, KPAD), lambda i, j: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bu, KPAD), jnp.float32),
            pltpu.VMEM((bu, KPAD), jnp.int32),
        ],
        out_shape=jax.ShapeDtypeStruct((n_users_pad, KPAD), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_users_pad * n_items_pad * d,
            bytes_accessed=(
                ni * n_items_pad * d * 4
                + n_users_pad * d * 4
                + n_users_pad * n_items_pad // 8
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(users_rep, items_t, excl_words, banned_row)
    return out[:, :k]


def use_fused_retrieval(n_items: int) -> bool:
    """The fused kernel needs a real TPU (Mosaic) and enough items for the
    chunked grid to make sense."""
    return jax.default_backend() == "tpu" and n_items > LI
