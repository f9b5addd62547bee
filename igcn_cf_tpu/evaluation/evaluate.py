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

from functools import partial
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
    ``n_items`` (a sentinel column sliced off after the scatter)."""
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
    return out, width


@partial(jax.jit, static_argnames=("max_k", "n_items"))
def _mask_and_topk(
    scores: jnp.ndarray,
    exclude: jnp.ndarray,
    banned_mask: jnp.ndarray,
    max_k: int,
    n_items: int,
) -> jnp.ndarray:
    """scores (B, n_items); exclude (B, W) item ids padded with n_items;
    banned_mask (n_items,) bool. Returns (B, max_k) top item ids."""
    b = scores.shape[0]
    # one sentinel column absorbs the padding scatter
    ext = jnp.concatenate([scores, jnp.zeros((b, 1), scores.dtype)], axis=1)
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], exclude.shape)
    ext = ext.at[rows, exclude].set(NEG_INF, mode="drop")
    scores = ext[:, :n_items]
    scores = jnp.where(banned_mask[None, :], NEG_INF, scores)
    _, items = jax.lax.top_k(scores, max_k)
    return items


def recommend(
    predict_fn: Callable[[jnp.ndarray], jnp.ndarray],
    ds,
    split: str,
    topks: Sequence[int],
    banned_items: Optional[np.ndarray] = None,
    test_batch_size: int = 512,
) -> np.ndarray:
    """Top-max(topks) recommendations for every user (reference
    trainer.py:140-166). ``predict_fn`` maps (B,) user ids to (B, n_items)
    scores and is expected to be jitted with cached representations."""
    n_users, n_items = ds.n_users, ds.n_items
    max_k = max(topks)
    if split != "train":
        exclude_np, _ = build_exclusion(ds, include_val=(split == "test"))
    else:
        exclude_np = np.full((n_users, 1), n_items, dtype=np.int32)
    exclude = jnp.asarray(exclude_np)

    banned_mask_np = np.zeros(n_items, dtype=bool)
    if banned_items is not None:
        banned_mask_np[np.asarray(banned_items, dtype=np.int64)] = True
    banned_mask = jnp.asarray(banned_mask_np)

    # fixed batch size with tail padding so the jitted fns see one shape.
    # All batches are DISPATCHED without synchronizing and concatenated on
    # device; the single np.asarray at the end is the only D2H. (A blocking
    # per-batch readback costs one tunnel round-trip per 512 users on the
    # remote-TPU platform — it dominated eval wall-clock in round 2.)
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


def evaluate(
    predict_fn,
    ds,
    split: str,
    topks: Sequence[int],
    banned_items: Optional[np.ndarray] = None,
    test_batch_size: int = 512,
):
    """Returns (formatted_results_str, metrics dict) like the reference
    ``BasicTrainer.eval`` (reference trainer.py:140-177)."""
    eval_data: List[List[int]] = getattr(ds, split)
    rec = recommend(predict_fn, ds, split, topks, banned_items, test_batch_size)
    metrics = calculate_metrics(eval_data, rec, topks)
    return format_metrics(metrics, topks), metrics
