"""Sharded training steps for the flagship INMO (IGCN) model.

Builds a jitted multi-chip BPR+aux train step over a ('data', 'table') mesh:

  * template embedding table row-sharded along ``table``;
  * feat-mat and adjacency edge partitions sharded by destination row block;
  * the INMO aggregation and LightGCN propagation run as shard-local
    segment-sum SpMMs with all-gathers of the dense operand along ``table``
    (ICI collectives; reverse-mode AD turns them into reduce-scatters for the
    table gradients);
  * the BPR/aux batch is sharded along ``data``; losses are pmean'd across
    it;
  * the optimizer update runs outside shard_map on the sharded param pytree
    (GSPMD keeps Adam elementwise-local per shard).

The same step compiles for n real TPU chips or n virtual CPU devices — the
driver's ``dryrun_multichip`` uses the latter.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from igcn_cf_tpu.core.mesh import DATA_AXIS, TABLE_AXIS
from igcn_cf_tpu.graph.build import build_feat_mat, sym_norm_adjacency
from igcn_cf_tpu.parallel.sharded import (
    ShardedGraph,
    propagate_mean_local,
    spmm_local,
)


@dataclass
class ShardedINMOTrain:
    mesh: Mesh
    step: Any  # jitted (params, opt_state, buffers, batch, key) -> (params, opt_state, loss)
    params: Dict[str, jnp.ndarray]
    opt_state: Any
    buffers: Dict[str, Any]
    n_users: int
    n_items: int


def build_inmo_sharded_train(
    dataset,
    mesh: Mesh,
    *,
    embedding_size: int = 64,
    n_layers: int = 3,
    dropout: float = 0.3,
    lr: float = 1e-3,
    l2_reg: float = 0.0,
    aux_reg: float = 0.01,
    batch_size: int = 2048,
    seed: int = 2021,
) -> ShardedINMOTrain:
    n_users, n_items = dataset.n_users, dataset.n_items
    n_shards = mesh.shape[TABLE_AXIS]
    data_size = mesh.shape[DATA_AXIS]
    assert batch_size % data_size == 0

    # -- host graph builds, partitioned by destination row ------------------
    user_map = {u: u for u in range(n_users)}
    item_map = {i: i for i in range(n_items)}
    adj = sym_norm_adjacency(dataset.train_array, n_users, n_items)
    feat = build_feat_mat(dataset.train_array, n_users, n_items, user_map, item_map)

    adj_sh = ShardedGraph.from_coo(adj, n_shards)
    feat_pattern = ShardedGraph.from_coo(feat.coo, n_shards)
    # per-edge row sums (for the annealed weights) and live mask, in the same
    # edge partition layout
    from igcn_cf_tpu.graph.build import COO

    rowsum_coo = COO(
        feat.coo.rows, feat.coo.cols, feat.row_sum[feat.coo.rows].astype(np.float32),
        feat.coo.shape,
    )
    feat_rowsum = ShardedGraph.from_coo(rowsum_coo, n_shards).vals
    live_coo = COO(
        feat.coo.rows, feat.coo.cols, np.ones(feat.coo.nnz, np.float32), feat.coo.shape
    )
    feat_live = ShardedGraph.from_coo(live_coo, n_shards).vals

    n_templates = feat.coo.shape[1]
    # template table padded so each shard holds an equal row block
    t_rows = -(-n_templates // (n_shards * 8)) * 8
    n_templates_pad = t_rows * n_shards

    # -- shardings ----------------------------------------------------------
    tbl = NamedSharding(mesh, P(TABLE_AXIS, None))
    tbl_edges = NamedSharding(mesh, P(TABLE_AXIS, None))
    repl = NamedSharding(mesh, P())
    databatch = NamedSharding(mesh, P(DATA_AXIS))

    key = jax.random.PRNGKey(seed)
    emb = 0.1 * jax.random.normal(key, (n_templates_pad, embedding_size), jnp.float32)
    params = {
        "embedding": jax.device_put(emb, tbl),
        "w": jax.device_put(jnp.ones((embedding_size,), jnp.float32), repl),
    }

    def put_graph(g: ShardedGraph):
        return {
            "rows_local": jax.device_put(g.rows_local, tbl_edges),
            "cols": jax.device_put(g.cols, tbl_edges),
            "vals": jax.device_put(g.vals, tbl_edges),
        }

    buffers = {
        "adj": put_graph(adj_sh),
        "feat": put_graph(feat_pattern),
        "feat_rowsum": jax.device_put(feat_rowsum, tbl_edges),
        "feat_live": jax.device_put(feat_live, tbl_edges),
        "alpha": jax.device_put(jnp.float32(1.0), repl),
    }

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    adj_rows_per_shard = adj_sh.rows_per_shard
    feat_rows_per_shard = feat_pattern.rows_per_shard  # == adj_rows_per_shard

    edge_spec = P(TABLE_AXIS, None)
    graph_spec = {"rows_local": edge_spec, "cols": edge_spec, "vals": edge_spec}

    # ----------------------------------------------------------------------
    def loss_fn(params, buffers, batch, key):
        users, pos, neg, a_users, a_pos, a_neg = batch

        def f(emb_shard, w, adj_g, feat_g, feat_rowsum, feat_live, alpha,
              users, pos, neg, a_users, a_pos, a_neg, key):
            # annealed feat weights (reference model.py:374-377) + edge dropout
            exponent = (alpha - 1.0) / 2.0 - 0.5
            # padding edges have rowsum 0: guard the pow so 0^-0.5 never
            # produces inf*0=NaN
            vals = jnp.where(
                feat_live > 0.0,
                jnp.power(jnp.maximum(feat_rowsum, 1.0), exponent),
                0.0,
            )
            if dropout > 0.0:
                keep = jax.random.bernoulli(key, 1.0 - dropout, vals.shape)
                vals = jnp.where(keep, vals / (1.0 - dropout), 0.0)
            x0_local = spmm_local(
                feat_g["rows_local"], feat_g["cols"], vals,
                feat_rows_per_shard, emb_shard,
            )
            rep_local = propagate_mean_local(
                (adj_g["rows_local"], adj_g["cols"], adj_g["vals"]),
                adj_rows_per_shard, x0_local, n_layers,
            )
            rep = jax.lax.all_gather(rep_local, TABLE_AXIS, axis=0, tiled=True)
            u = rep[users]
            p = rep[n_users + pos]
            n_ = rep[n_users + neg]
            pos_s = jnp.sum(u * p, axis=1)
            neg_s = jnp.sum(u * n_, axis=1)
            bpr = jnp.mean(jax.nn.softplus(neg_s - pos_s))
            l2 = jnp.mean(
                jnp.sum(u * u, axis=1) + jnp.sum(p * p, axis=1) + jnp.sum(n_ * n_, axis=1)
            )
            # aux self-enhanced BPR on raw template embeddings
            emb_full = jax.lax.all_gather(emb_shard, TABLE_AXIS, axis=0, tiled=True)
            au = emb_full[a_users]
            ap = emb_full[a_pos + n_users]
            an = emb_full[a_neg + n_users]
            aux = jnp.mean(
                jax.nn.softplus(
                    jnp.sum(au * an * w[None, :], axis=1)
                    - jnp.sum(au * ap * w[None, :], axis=1)
                )
            )
            loss = bpr + l2_reg * l2 + aux_reg * aux
            return jax.lax.pmean(loss, DATA_AXIS)

        return jax.shard_map(
            f,
            mesh=mesh,
            in_specs=(
                P(TABLE_AXIS, None), P(),
                graph_spec, graph_spec, edge_spec, edge_spec, P(),
                P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                P(),
            ),
            out_specs=P(),
            check_vma=False,
        )(
            params["embedding"], params["w"],
            buffers["adj"], buffers["feat"],
            buffers["feat_rowsum"], buffers["feat_live"], buffers["alpha"],
            users, pos, neg, a_users, a_pos, a_neg, key,
        )

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, buffers, batch, key):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, buffers, batch, key)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return ShardedINMOTrain(
        mesh=mesh,
        step=step,
        params=params,
        opt_state=opt_state,
        buffers=buffers,
        n_users=n_users,
        n_items=n_items,
    )


def make_batch(mesh: Mesh, rng: np.random.Generator, dataset, batch_size: int):
    """Host-sampled sharded batch (main + aux triples share the id space when
    feature_ratio=1)."""
    databatch = NamedSharding(mesh, P(DATA_AXIS))
    n_users, n_items = dataset.n_users, dataset.n_items
    arr = dataset.train_array
    idx = rng.integers(0, len(arr), batch_size)
    users = arr[idx, 0].astype(np.int32)
    pos = arr[idx, 1].astype(np.int32)
    neg = rng.integers(0, n_items, batch_size).astype(np.int32)
    out = []
    for a in (users, pos, neg, users, pos, neg):
        out.append(jax.device_put(jnp.asarray(a), databatch))
    return tuple(out)
