"""Masked full-catalog top-k retrieval evaluation.

Reproduces the reference eval protocol (reference trainer.py:140-177): for
each user-batch, score the full catalog, mask the user's train items (plus val
items when testing) and any banned items to -inf, take top-k, then compute
Precision/Recall/NDCG against the split's eval lists.

TPU-first differences from the reference:
  * representations are computed once per eval, not once per user batch
    (reference model.py:118-123 recomputes get_rep() per 512-user batch; at
    eval there is no dropout so caching is exact — SURVEY.md §7 hard part 1);
  * train/val exclusion masking is a device scatter over a padded per-user
    exclusion matrix instead of a host python loop building index lists
    (reference trainer.py:149-159);
  * top-k runs on device via jax.lax.top_k; only (n_users, max_k) indices
    travel device->host.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from igcn_cf_tpu.evaluation.metrics import calculate_metrics, format_metrics

NEG_INF = -np.inf


def build_exclusion(
    ds, include_val: bool
) -> Tuple[np.ndarray, int]:
    """Padded per-user exclusion items (train, +val when testing), padded with
    ``n_items`` (a sentinel column sliced off after the scatter). Memoized on
    the dataset instance — the host loop over all users costs real wall-clock
    per eval at 30k+ users, and train/val never change within a run (inductive
    slices swap in FRESH dataset objects, so a stale hit is impossible)."""
    cache = getattr(ds, "_exclusion_cache", None)
    if cache is None:
        cache = {}
        try:
            ds._exclusion_cache = cache
        except AttributeError:
            pass  # exotic dataset object: just rebuild each call
    if include_val in cache:
        return cache[include_val]
    lists = []
    for u in range(ds.n_users):
        items = list(ds.train[u])
        if include_val:
            items = items + list(ds.val[u])
        lists.append(items)
    width = max(1, max(len(x) for x in lists))
    out = np.full((ds.n_users, width), ds.n_items, dtype=np.int32)
    for u, items in enumerate(lists):
        out[u, : len(items)] = items
    cache[include_val] = (out, width)
    return out, width


_TOPK_CHUNK = 1024


def exact_topk(scores: jnp.ndarray, k: int,
               chunk: int = _TOPK_CHUNK):
    """Exact two-stage top-k (values, ids) over the item axis: per-chunk
    lax.top_k, then re-rank the C*k candidates. Every global top-k element
    is in its chunk's top-k, so the result set is exact (ties: stable by
    chunk order, matching flat top_k's lower-index-first up to equal-value
    permutations). ~4.7x faster than flat lax.top_k at (512, 41k) k=20 on
    v5e (tools/microbench_topk.py)."""
    b, n = scores.shape
    if n <= 2 * chunk or k > chunk:
        return jax.lax.top_k(scores, k)
    c = -(-n // chunk)
    pad = c * chunk - n
    if pad:
        scores = jnp.concatenate(
            [scores, jnp.full((b, pad), NEG_INF, scores.dtype)], axis=1
        )
    cv, ci = jax.lax.top_k(scores.reshape(b, c, chunk), k)
    base = (jnp.arange(c, dtype=ci.dtype) * chunk)[None, :, None]
    cand_idx = (ci + base).reshape(b, c * k)
    cand_val = cv.reshape(b, c * k)
    vals, sel = jax.lax.top_k(cand_val, k)
    return vals, jnp.take_along_axis(cand_idx, sel, axis=1)


def exact_topk_ids(scores: jnp.ndarray, k: int,
                   chunk: int = _TOPK_CHUNK) -> jnp.ndarray:
    """Ids-only wrapper of ``exact_topk``."""
    return exact_topk(scores, k, chunk)[1]


def mask_topk_core(
    scores: jnp.ndarray,
    exclude: jnp.ndarray,
    banned_mask: jnp.ndarray,
    max_k: int,
    n_items: int,
) -> jnp.ndarray:
    """scores (B, n_items); exclude (B, W) item ids padded with n_items;
    banned_mask (n_items,) bool. Returns (B, max_k) top item ids. Pure
    traced function — jitted per call site (the per-batch path below and the
    models' single-dispatch scan both build on it)."""
    b = scores.shape[0]
    # one sentinel column absorbs the padding scatter
    ext = jnp.concatenate([scores, jnp.zeros((b, 1), scores.dtype)], axis=1)
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], exclude.shape)
    ext = ext.at[rows, exclude].set(NEG_INF, mode="drop")
    scores = ext[:, :n_items]
    scores = jnp.where(banned_mask[None, :], NEG_INF, scores)
    return exact_topk_ids(scores, max_k)


_mask_and_topk = jax.jit(
    mask_topk_core, static_argnames=("max_k", "n_items")
)


def _packed_exclusion_dev(ds, split: str, nup: int, nip: int):
    """Device-resident packed exclusion words for the fused retrieval
    kernel, cached per dataset+split and packed ON DEVICE; train-split
    exclusion is empty and skips packing."""
    cache = getattr(ds, "_packed_excl_cache", None)
    if cache is None:
        cache = {}
        try:
            ds._packed_excl_cache = cache
        except AttributeError:
            pass
    key = (split != "train", split == "test", nup, nip)
    words = cache.get(key)
    if words is None:
        if split == "train":
            words = jnp.zeros((nup, nip // 32), dtype=jnp.uint32)
        else:
            from igcn_cf_tpu.kernels.retrieval import (
                pack_exclusion_words_device,
            )

            lists = [list(ds.train[u]) for u in range(ds.n_users)]
            if split == "test":
                lists = [a + list(b) for a, b in zip(lists, ds.val)]
            rows = np.concatenate(
                [np.full(len(x), u, np.int32)
                 for u, x in enumerate(lists) if len(x)]
                or [np.zeros(0, np.int32)]
            )
            cols = np.concatenate(
                [np.asarray(x, np.int32) for x in lists if len(x)]
                or [np.zeros(0, np.int32)]
            )
            # pack ON DEVICE: H2D moves the (nnz,) id arrays instead of the
            # ~170 MB packed matrix over the remote-TPU tunnel
            words = pack_exclusion_words_device(rows, cols, nup, nip)
        cache[key] = words
    return words


def _recommend_packed_dev(recommend_fn, ds, split, banned_items, max_k):
    """Fused-kernel path (kernels/retrieval.py): packed exclusion words
    cached device-resident per dataset+split; the banned/pad score row is
    tiny and rebuilt per call (inductive slices vary it). Returns the
    (n_users, max_k) recommendation ids ON DEVICE (evaluate keeps them there
    for the device-side metrics; recommend() pulls them to host)."""
    from igcn_cf_tpu.kernels.retrieval import NEG

    nup, nip = recommend_fn.geometry
    words_dev = _packed_exclusion_dev(ds, split, nup, nip)
    banned_row = np.zeros((1, nip), np.float32)
    if banned_items is not None:
        banned_row[0, np.asarray(banned_items, dtype=np.int64)] = NEG
    banned_row[0, ds.n_items:] = NEG
    rec_dev = recommend_fn(words_dev, jnp.asarray(banned_row), max_k)
    return rec_dev[: ds.n_users]


def pad_user_blocks(
    n_users: int, block: int
) -> np.ndarray:
    """(nb, block) user ids covering 0..n_users-1, tail padded by repeating
    the last user (its duplicate rows are sliced off after the scan)."""
    nb = -(-n_users // block)
    users = np.arange(nb * block, dtype=np.int32)
    return np.minimum(users, n_users - 1).reshape(nb, block)


def _eval_inputs(ds, split, banned_items):
    n_users, n_items = ds.n_users, ds.n_items
    if split != "train":
        exclude_np, _ = build_exclusion(ds, include_val=(split == "test"))
    else:
        exclude_np = np.full((n_users, 1), n_items, dtype=np.int32)
    banned_mask_np = np.zeros(n_items, dtype=bool)
    if banned_items is not None:
        banned_mask_np[np.asarray(banned_items, dtype=np.int64)] = True
    return exclude_np, banned_mask_np


def recommend(
    predict_fn: Callable[[jnp.ndarray], jnp.ndarray],
    ds,
    split: str,
    topks: Sequence[int],
    banned_items: Optional[np.ndarray] = None,
    test_batch_size: int = 512,
    recommend_fn=None,
) -> np.ndarray:
    """Top-max(topks) recommendations for every user (reference
    trainer.py:140-166).

    Two paths:
      * ``recommend_fn`` (from ``model.make_recommend_fn``): the WHOLE eval
        is one jitted ``lax.scan`` over user blocks — one dispatch, one D2H
        of (n_users, max_k) ids. On the remote-TPU platform each dispatch
        pays a tunnel round-trip, so the ~59 sequential per-batch dispatches
        of the fallback dominated eval wall-clock (VERDICT r3 weak #2).
      * fallback: per-batch ``predict_fn`` ((B,) user ids -> (B, n_items)
        scores) + jitted mask/topk, dispatched without synchronizing,
        concatenated on device, one D2H at the end.
    """
    n_users, n_items = ds.n_users, ds.n_items
    max_k = max(topks)

    if recommend_fn is not None and getattr(recommend_fn, "wants_packed", False):
        rec_dev = _recommend_packed_dev(
            recommend_fn, ds, split, banned_items, max_k
        )
        return np.asarray(rec_dev).astype(np.int64)

    exclude_np, banned_mask_np = _eval_inputs(ds, split, banned_items)
    banned_mask = jnp.asarray(banned_mask_np)

    if recommend_fn is not None:
        users_pad = pad_user_blocks(n_users, test_batch_size)
        # the (n_users, W) exclusion matrix stays RESIDENT on device, cached
        # per dataset+split: re-uploading ~50 MB over the remote-TPU tunnel
        # every eval dwarfed the compute (round-4 breakdown finding); the
        # scan body gathers each block's rows on device
        dev_cache = getattr(ds, "_exclusion_dev_cache", None)
        if dev_cache is None:
            dev_cache = {}
            try:
                ds._exclusion_dev_cache = dev_cache
            except AttributeError:
                pass
        ck = (split, exclude_np.shape)
        exclude_dev = dev_cache.get(ck)
        if exclude_dev is None:
            exclude_dev = dev_cache[ck] = jnp.asarray(exclude_np)
        rec_dev = recommend_fn(
            jnp.asarray(users_pad), exclude_dev, banned_mask, max_k
        )
        return np.asarray(rec_dev[:n_users]).astype(np.int64)

    exclude = jnp.asarray(exclude_np)
    parts = []
    for start in range(0, n_users, test_batch_size):
        stop = min(start + test_batch_size, n_users)
        users_np = np.arange(start, stop, dtype=np.int32)
        if stop - start < test_batch_size:
            pad = np.full(test_batch_size - (stop - start), stop - 1, dtype=np.int32)
            users_np = np.concatenate([users_np, pad])
        users = jnp.asarray(users_np)
        scores = predict_fn(users)
        parts.append(
            _mask_and_topk(scores, exclude[users], banned_mask, max_k, n_items)
        )
    rec_dev = jnp.concatenate(parts, axis=0)[:n_users]
    return np.asarray(rec_dev).astype(np.int64)


def evaluate_fused(eval_fn, ds, split: str, topks: Sequence[int],
                   banned_items: Optional[np.ndarray] = None):
    """ONE-dispatch metric eval: ``eval_fn`` (from
    ``model.make_fused_eval_fn``) runs rep -> fused retrieval -> device
    metric reductions inside a single jitted call; this wrapper only
    supplies the device-resident cached inputs (packed exclusion words,
    banned/pad row, padded eval lists) and unflattens the 3*len(topks)
    scalars that come back. Reference protocol: trainer.py:140-177."""
    from igcn_cf_tpu.evaluation.metrics import (
        padded_eval_dev,
        unflatten_metrics,
    )
    from igcn_cf_tpu.kernels.retrieval import NEG

    nup, nip = eval_fn.geometry
    words_dev = _packed_exclusion_dev(ds, split, nup, nip)
    banned_row = np.zeros((1, nip), np.float32)
    if banned_items is not None:
        banned_row[0, np.asarray(banned_items, dtype=np.int64)] = NEG
    banned_row[0, ds.n_items:] = NEG
    eval_data: List[List[int]] = getattr(ds, split)
    padded, lens = padded_eval_dev(eval_data, cache_on=ds, cache_key=split)
    flat = np.asarray(
        eval_fn(words_dev, jnp.asarray(banned_row), padded, lens, topks,
                max(topks))
    )
    metrics = unflatten_metrics(flat, topks)
    return format_metrics(metrics, topks), metrics


def evaluate(
    predict_fn,
    ds,
    split: str,
    topks: Sequence[int],
    banned_items: Optional[np.ndarray] = None,
    test_batch_size: int = 512,
    recommend_fn=None,
):
    """Returns (formatted_results_str, metrics dict) like the reference
    ``BasicTrainer.eval`` (reference trainer.py:140-177)."""
    eval_data: List[List[int]] = getattr(ds, split)
    if recommend_fn is not None and getattr(recommend_fn, "wants_packed", False):
        # fused path: keep the recommendations on device and reduce the
        # metrics there too — only len(topks)*3 scalars travel D2H
        from igcn_cf_tpu.evaluation.metrics import calculate_metrics_device

        rec_dev = _recommend_packed_dev(
            recommend_fn, ds, split, banned_items, max(topks)
        )
        metrics = calculate_metrics_device(
            rec_dev, eval_data, topks, cache_on=ds, cache_key=split
        )
        return format_metrics(metrics, topks), metrics
    rec = recommend(
        predict_fn, ds, split, topks, banned_items, test_batch_size,
        recommend_fn=recommend_fn,
    )
    metrics = calculate_metrics(eval_data, rec, topks)
    return format_metrics(metrics, topks), metrics
