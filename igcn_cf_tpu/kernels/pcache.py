"""Propagation cache — precomputed ``P = mean_{k=0..K} A^k`` for models whose
propagation operator is FIXED across training.

Why this exists (the round-2 perf unlock): the reference recomputes full-graph
K-layer propagation for every 2048-interaction batch (reference
model.py:434-446 for IGCN, model.py:95-106 for LightGCN) and only then gathers
the ~6k batch rows. On TPU the per-batch propagation is 12-16 bit-packed
matmul halves whose output width is the embedding dim d=64 — half the 128-wide
MXU idles, so the dense recompute formulation is compute-bound ABOVE the
baseline step time no matter how good the kernel is.

But for IGCN the per-batch edge dropout applies ONLY to the feature matrix
(reference model.py:435); the K-layer propagation runs over the fixed
``norm_adj`` with a mean over layers 0..K, and the per-epoch alpha anneal
(reference model.py:374-381) only rescales feat rows. LightGCN has no dropout
at all. So the linear operator

    P = (A^0 + A^1 + ... + A^K) / (K + 1),      A = D^-1/2 [[0,B],[B^T,0]] D^-1/2

is constant for the entire training run. We precompute P ONCE (column-blocked
through the bit-packed engine at full MXU width — seconds, not minutes), store
it in HBM as bfloat16, and each train step only:

    rows  = [users, n_users+pos, n_users+neg]          (3·batch ids)
    P_b   = P[rows]                                     (one row gather)
    reps  = P_b @ X0                                    (forward)
    dX0   = P_b^T @ d(reps)                             (backward)

A is symmetric, so P is symmetric and the SAME gathered rows serve forward and
backward — the step's propagation cost drops from O(passes · n^2 · d) MXU time
to O(batch · n) HBM gather traffic, an order of magnitude on Gowalla.

Numerics: P is stored in bfloat16 (relative error <= 2^-9 per entry; the
training matmuls already run their inputs in bfloat16). The backward uses the
same bf16 P, so gradients are exact FOR the forward actually computed.
EVALUATION keeps the exact bit-packed propagate path — metrics never see the
cached operator. Capacity: P is (n, n_pad) bf16 = ~10 GB at Gowalla/Yelp scale
(fits v5e HBM next to everything else); catalogs beyond ``PCACHE_BUDGET_BYTES``
(e.g. Amazon-book, 156k nodes -> 49 GB) automatically stay on the bit-packed
recompute engine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from igcn_cf_tpu.kernels.dense_graph import BipartiteDense, sym_norm_propagate

# P plus the per-step gathered row block (+ slack for params/opt/eval reps)
# must fit beside the bit-packed B in 16 GB of v5e HBM.
PCACHE_BUDGET_BYTES = 11 * 1024**3

# Column-block width for the build: one full MXU lane width. Wider blocks hit
# the 16 MB scoped-VMEM limit in the transpose kernel (its out/acc blocks are
# (TK=4096, width) f32).
BUILD_BLOCK = 128


def pcache_bytes(n_users: int, n_items: int) -> int:
    n = n_users + n_items
    n_pad = -(-n // BUILD_BLOCK) * BUILD_BLOCK
    return n * n_pad * 2


def pcache_fits(n_users: int, n_items: int,
                budget: int = PCACHE_BUDGET_BYTES) -> bool:
    return pcache_bytes(n_users, n_items) <= budget


def use_pcache(n_users: int, n_items: int, n_layers: int,
               requested="auto") -> bool:
    """Decide whether a fixed-propagation model should train through the
    cache. 'auto' = TPU with the cache in budget; True forces it (tests build
    tiny caches on CPU through the XLA fallback); False disables."""
    if requested is True:
        return n_layers >= 1
    if requested is not False and requested != "auto":
        raise ValueError(f"unknown prop_cache setting {requested!r}")
    return (
        requested == "auto"
        and n_layers >= 1
        and jax.default_backend() == "tpu"
        and pcache_fits(n_users, n_items)
    )


def build_prop_cache(g: BipartiteDense, n_layers: int,
                     block: int = BUILD_BLOCK) -> jnp.ndarray:
    """P = mean_{k=0..K} A^k as an (n, n_pad) bfloat16 array, built one
    column block at a time: x = I[:, c0:c0+W] one-hot, K sym-norm propagate
    passes through the bit-packed engine (RHS width W=512 -> full-width MXU,
    unlike the d=64 training passes), accumulated in f32, written bf16 via a
    donated dynamic_update_slice (in place; the 10 GB buffer is never
    copied)."""
    n = g.n_users + g.n_items
    n_pad = -(-n // block) * block  # update-slice blocks must tile exactly
    inv = 1.0 / float(n_layers + 1)

    @partial(jax.jit, donate_argnums=(0,))
    def fill(p, bip, c0):
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, block), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, block), 1) + c0
        x = (rows == cols).astype(jnp.float32)
        acc = x * inv
        for _ in range(n_layers):
            x = sym_norm_propagate(bip, x)
            acc = acc + x * inv
        return jax.lax.dynamic_update_slice(
            p, acc.astype(jnp.bfloat16), (0, c0)
        )

    p = jnp.zeros((n, n_pad), jnp.bfloat16)
    for c0 in range(0, n_pad, block):
        # one-hot columns past n propagate to zero (no edges), so the last
        # partial block writes zeros there — harmless padding columns.
        p = fill(p, g, jnp.int32(c0))
    return p


@jax.custom_vjp
def gathered_prop(p_rows: jnp.ndarray, x0: jnp.ndarray) -> jnp.ndarray:
    """reps = P[rows] @ X0 with the backward running as a dim0-contraction
    over the SAME gathered rows (P symmetric => P[rows]^T are the needed
    columns). ``p_rows`` is (R, n_pad) bf16 and non-differentiable; ``x0`` is
    (n, d) f32 — padded to n_pad internally."""
    return _gp_fwd_only(p_rows, x0)


def _pad_rows_to(x, n_pad):
    if x.shape[0] == n_pad:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((n_pad - x.shape[0],) + x.shape[1:], x.dtype)], axis=0
    )


def _gp_fwd_only(p_rows, x0):
    xb = _pad_rows_to(x0, p_rows.shape[1]).astype(jnp.bfloat16)
    return jnp.dot(p_rows, xb, preferred_element_type=jnp.float32)


def _gp_fwd(p_rows, x0):
    return _gp_fwd_only(p_rows, x0), (p_rows, x0.shape[0])


def _gp_bwd(res, ct):
    p_rows, n = res
    dx0 = jax.lax.dot_general(
        p_rows,
        ct.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return None, dx0[:n].astype(jnp.float32)


gathered_prop.defvjp(_gp_fwd, _gp_bwd)


def gather_rows(p: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """P[rows] without gradient tracking (P is a buffer)."""
    return jax.lax.stop_gradient(
        p.at[rows].get(mode="promise_in_bounds", unique_indices=False)
    )


def prop_cache_oracle(train_array: np.ndarray, n_users: int, n_items: int,
                      n_layers: int) -> np.ndarray:
    """Dense NumPy mean_k A^k for tests (exact, f32)."""
    n = n_users + n_items
    a = np.zeros((n, n), np.float64)
    for u, i in np.asarray(train_array):
        a[u, n_users + i] = 1.0
        a[n_users + i, u] = 1.0
    deg = np.maximum(a.sum(1), 1.0)
    s = 1.0 / np.sqrt(deg)
    a = s[:, None] * a * s[None, :]
    p = np.eye(n)
    x = np.eye(n)
    for _ in range(n_layers):
        x = a @ x
        p = p + x
    return (p / (n_layers + 1)).astype(np.float32)
