"""Dense-bipartite graph engine — the MXU formulation of graph propagation.

Why: on TPU, gather/segment-sum SpMM runs as a serialized per-edge loop
(~17 cycles/edge measured; tools/microbench_spmm2.py), leaving the MXU idle.
But every graph matrix in this workload is a BINARY interaction pattern with
rank-1 or row-wise scaling:

  * sym-norm adjacency (reference model.py:85-94):
        A = D^-1/2 [[0, B], [B^T, 0]] D^-1/2
    so A @ X = [ du ∘ (B @ (di ∘ X_i)) ; di ∘ (B^T @ (du ∘ X_u)) ]
  * NGCF's L1-row-normalized A+I (reference model.py:255-261):
        Y_u = (B @ X_i + X_u) / (deg_u + 1)        (and symmetrically)
  * INMO's feat_mat (reference model.py:386-421): binary train pattern
    restricted to template columns + a token column, with per-row annealed
    weights w_r = rowsum^((alpha-1)/2 - 1/2). Template selection folds into
    the EMBEDDING matrix (scatter core-template rows into full user/item
    space, zeros elsewhere), so the SAME dense B serves feat and adjacency:
        X0_u = w_u ∘ (B @ E_items_full + tok_u)

With B stored dense int8 (plus its transpose — XLA would otherwise
materialize one per transposed use) and converted to bf16 tile-wise inside
the Pallas kernels (kernels/binary_matmul.py), each propagation is a dense
MXU matmul at a fraction of the gather/scatter path's cost
(tools/microbench_dense.py). Memory: nu*ni bytes per half — Gowalla
1.22 GB/half; Amazon-book ~4.8 GB/half — both fit a 16 GB chip; larger
catalogs fall back to the sparse path (see choose_backend).

Edge dropout (reference model.py:263-275) = Bernoulli mask over the dense
entries (masking structural zeros is a no-op), applied by the fused Pallas
masked-matmul kernel (kernels/masked_matmul.py) with zero extra HBM traffic.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

PAD = 1024  # both dims padded to the largest kernel tile (binary_matmul TILE_K)


def _pad_to(n: int, m: int = PAD) -> int:
    return -(-n // m) * m


def _pad_rows(x: jnp.ndarray, n: int) -> jnp.ndarray:
    if x.shape[0] == n:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((n - x.shape[0],) + x.shape[1:], x.dtype)], axis=0
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["B", "BT", "deg_u", "deg_i"],
    meta_fields=["n_users", "n_items", "lean"],
)
@dataclass(frozen=True)
class BipartiteDense:
    """Binary interaction matrix (padded to tile multiples), both
    orientations, plus logical-size degree vectors. ``lean=True`` routes
    plain matmuls through the Pallas kernel too (no hoisted bf16 copies —
    for catalogs that only fit as int8)."""

    B: jnp.ndarray  # (nup, nip) int8 in {0, 1}
    BT: jnp.ndarray  # (nip, nup) int8
    deg_u: jnp.ndarray  # (n_users,) f32
    deg_i: jnp.ndarray  # (n_items,) f32
    n_users: int
    n_items: int
    lean: bool = False

    @staticmethod
    def build(train_array: np.ndarray, n_users: int, n_items: int,
              lean: bool = False) -> "BipartiteDense":
        nup, nip = _pad_to(n_users), _pad_to(n_items)
        b = np.zeros((nup, nip), dtype=np.float32)
        if len(train_array):
            b[train_array[:, 0], train_array[:, 1]] = 1.0
        deg_u = b.sum(axis=1)[:n_users]
        deg_i = b.sum(axis=0)[:n_items]
        return BipartiteDense(
            B=jnp.asarray(b.astype(np.int8)),
            BT=jnp.asarray(b.T.astype(np.int8)),
            deg_u=jnp.asarray(deg_u.astype(np.float32)),
            deg_i=jnp.asarray(deg_i.astype(np.float32)),
            n_users=n_users,
            n_items=n_items,
            lean=lean,
        )

    # B @ xi -> (n_users, d)
    def mm_ui(self, xi: jnp.ndarray) -> jnp.ndarray:
        from igcn_cf_tpu.kernels.binary_matmul import binary_matmul

        xi = _pad_rows(xi, self.B.shape[1])
        return binary_matmul(self.B, self.BT, xi, self.lean)[: self.n_users]

    # B^T @ xu -> (n_items, d)
    def mm_iu(self, xu: jnp.ndarray) -> jnp.ndarray:
        from igcn_cf_tpu.kernels.binary_matmul import binary_matmul

        xu = _pad_rows(xu, self.BT.shape[1])
        return binary_matmul(self.BT, self.B, xu, self.lean)[: self.n_items]

    def mm_ui_dropped(self, xi, key, p: float) -> jnp.ndarray:
        from igcn_cf_tpu.kernels.binary_matmul import binary_matmul_dropped

        xi = _pad_rows(xi, self.B.shape[1])
        return binary_matmul_dropped(self.B, self.BT, xi, key, p)[: self.n_users]

    def mm_iu_dropped(self, xu, key, p: float) -> jnp.ndarray:
        from igcn_cf_tpu.kernels.binary_matmul import binary_matmul_dropped

        xu = _pad_rows(xu, self.BT.shape[1])
        return binary_matmul_dropped(self.BT, self.B, xu, key, p)[: self.n_items]

    def memory_bytes(self) -> int:
        return 2 * int(self.B.shape[0]) * int(self.B.shape[1])


def sym_norm_propagate(g: BipartiteDense, x: jnp.ndarray) -> jnp.ndarray:
    """One D^-1/2 A D^-1/2 @ X step (LightGCN/IGCN/IMCGAE propagation)."""
    su = jax.lax.rsqrt(jnp.maximum(g.deg_u, 1.0))[:, None]
    si = jax.lax.rsqrt(jnp.maximum(g.deg_i, 1.0))[:, None]
    xu, xi = x[: g.n_users], x[g.n_users :]
    yu = su * g.mm_ui(si * xi)
    yi = si * g.mm_iu(su * xu)
    return jnp.concatenate([yu, yi], axis=0)


def sym_norm_propagate_mean(
    g: BipartiteDense, x0: jnp.ndarray, n_layers: int
) -> jnp.ndarray:
    acc = x0
    x = x0
    for _ in range(n_layers):
        x = sym_norm_propagate(g, x)
        acc = acc + x
    return acc / float(n_layers + 1)


def ngcf_propagate(
    g: BipartiteDense,
    x: jnp.ndarray,
    *,
    dropout: float = 0.0,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """One L1-row-norm (A + I) @ X step (NGCF message aggregation, reference
    model.py:255-261,284), with optional edge dropout over interaction AND
    self-loop entries (reference model.py:280)."""
    xu, xi = x[: g.n_users], x[g.n_users :]
    if dropout > 0.0 and key is not None:
        k_b, k_bt, k_su, k_si = jax.random.split(key, 4)
        scale = 1.0 / (1.0 - dropout)
        self_u = jax.random.bernoulli(k_su, 1.0 - dropout, (g.n_users, 1))
        self_i = jax.random.bernoulli(k_si, 1.0 - dropout, (g.n_items, 1))
        yu = (g.mm_ui_dropped(xi, k_b, dropout) + jnp.where(self_u, xu, 0.0)) * scale
        yi = (g.mm_iu_dropped(xu, k_bt, dropout) + jnp.where(self_i, xi, 0.0)) * scale
    else:
        yu = g.mm_ui(xi) + xu
        yi = g.mm_iu(xu) + xi
    yu = yu / (g.deg_u + 1.0)[:, None]
    yi = yi / (g.deg_i + 1.0)[:, None]
    return jnp.concatenate([yu, yi], axis=0)


def feat_aggregate(
    g: BipartiteDense,
    e_items_full: jnp.ndarray,  # (n_items, d); zero rows on non-template items
    e_users_full: jnp.ndarray,  # (n_users, d)
    tok_u: jnp.ndarray,  # (d,) shared user-token embedding
    tok_i: jnp.ndarray,
    w_u: jnp.ndarray,  # (n_users,) annealed row weights
    w_i: jnp.ndarray,
    *,
    dropout: float = 0.0,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """X0 = feat_mat @ E — the INMO inductive layer (reference
    model.py:423-432) — with optional edge dropout on both train edges and
    token edges (reference model.py:435 via 263-275). The user-side and
    item-side blocks of feat_mat are distinct edge sets, so their masks are
    independent."""
    if dropout > 0.0 and key is not None:
        k_b, k_bt, k_tu, k_ti = jax.random.split(key, 4)
        scale = 1.0 / (1.0 - dropout)
        tok_keep_u = jax.random.bernoulli(k_tu, 1.0 - dropout, (g.n_users, 1))
        tok_keep_i = jax.random.bernoulli(k_ti, 1.0 - dropout, (g.n_items, 1))
        xu = (
            g.mm_ui_dropped(e_items_full, k_b, dropout)
            + jnp.where(tok_keep_u, tok_u[None, :], 0.0)
        ) * scale
        xi = (
            g.mm_iu_dropped(e_users_full, k_bt, dropout)
            + jnp.where(tok_keep_i, tok_i[None, :], 0.0)
        ) * scale
    else:
        xu = g.mm_ui(e_items_full) + tok_u[None, :]
        xi = g.mm_iu(e_users_full) + tok_i[None, :]
    return jnp.concatenate([w_u[:, None] * xu, w_i[:, None] * xi], axis=0)


# Budgets for the dense engine on a 16 GiB chip. Fast mode (XLA plain
# matmuls) has ~3x the int8 footprint resident: XLA hoists a bf16 copy of
# each half out of epoch scans. Lean mode keeps only the int8 halves (all
# matmuls through the Pallas kernel, ~25% slower plain path). Gowalla
# (2.4 GiB) and Yelp (2.6 GiB) get fast mode; Amazon-book (9.8 GiB) gets
# lean mode; anything bigger falls back to the sparse engine.
DENSE_BUDGET_BYTES = 4 * 1024**3
DENSE_LEAN_BUDGET_BYTES = 11 * 1024**3


def dense_fits(n_users: int, n_items: int, budget: int = DENSE_BUDGET_BYTES) -> bool:
    return 2 * _pad_to(n_users) * _pad_to(n_items) <= budget


def choose_backend(n_users: int, n_items: int, requested: str = "auto") -> str:
    """'dense' (fast) / 'dense_lean' / 'sparse' on TPU by memory budget; CPU
    'auto' stays sparse (tests force dense modes explicitly)."""
    if requested in ("dense", "dense_lean", "sparse"):
        return requested
    if requested != "auto":
        raise ValueError(f"unknown graph backend {requested!r}")
    if jax.default_backend() == "tpu":
        if dense_fits(n_users, n_items):
            return "dense"
        if dense_fits(n_users, n_items, DENSE_LEAN_BUDGET_BYTES):
            return "dense_lean"
    return "sparse"
