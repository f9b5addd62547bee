"""Dense-bipartite backend tests: parity with the sparse path, masked-matmul
mask semantics, and dense-mode training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from igcn_cf_tpu.kernels.dense_graph import (
    BipartiteDense,
    feat_aggregate,
    ngcf_propagate,
    sym_norm_propagate_mean,
)
from igcn_cf_tpu.kernels.masked_matmul import (
    _keep_mask,
    _masked_mm_xla,
    dropped_matmul,
)
from igcn_cf_tpu.models.base import get_model
from igcn_cf_tpu.train.trainer import get_trainer


def _rep(model_cfg, ds, backend, key=0):
    model = get_model(dict(model_cfg, graph_backend=backend), ds)
    params = model.init_params(jax.random.PRNGKey(key))
    buffers = model.init_buffers()
    rep = model.rep(params, buffers, train=False, key=None)
    return np.asarray(rep), model, params, buffers


@pytest.mark.parametrize("name,extra", [
    ("LightGCN", {"n_layers": 3}),
    ("IGCN", {"n_layers": 2, "dropout": 0.0, "feature_ratio": 1.0}),
    ("IMF", {"n_layers": 0, "dropout": 0.0, "feature_ratio": 1.0}),
    ("IGCN", {"n_layers": 2, "dropout": 0.0, "feature_ratio": 0.7}),
])
def test_dense_matches_sparse_rep(tiny_ds, name, extra):
    cfg = {"name": name, "embedding_size": 16, **extra}
    rep_s, *_ = _rep(cfg, tiny_ds, "sparse")
    rep_d, *_ = _rep(cfg, tiny_ds, "dense")
    scale = np.abs(rep_s).max() + 1e-9
    np.testing.assert_allclose(rep_d / scale, rep_s / scale, atol=2e-2)


def test_bipartite_dense_padding(tiny_ds):
    g = BipartiteDense.build(tiny_ds.train_array, tiny_ds.n_users, tiny_ds.n_items)
    assert g.B.shape[0] % 1024 == 0 and g.B.shape[1] % 1024 == 0
    # padded rows/cols are all zero
    assert float(jnp.sum(g.B)) == len(tiny_ds)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(tiny_ds.n_items, 8)).astype(np.float32))
    y = g.mm_ui(x)
    assert y.shape == (tiny_ds.n_users, 8)


def test_keep_mask_deterministic_and_orientation_free():
    seed = jnp.uint32(1234)
    rows = jax.lax.broadcasted_iota(jnp.int32, (64, 32), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (64, 32), 1)
    m1 = np.asarray(_keep_mask(seed, rows, cols, 0.3))
    m2 = np.asarray(_keep_mask(seed, rows, cols, 0.3))
    assert np.array_equal(m1, m2)
    # transposed coordinates give the transposed mask
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (32, 64), 1)
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (32, 64), 0)
    mt = np.asarray(_keep_mask(seed, rows_t, cols_t, 0.3))
    assert np.array_equal(mt, m1.T)
    # drop rate ~ p
    assert abs((~m1).mean() - 0.3) < 0.05


def test_dropped_matmul_fwd_bwd_consistent(rng):
    m, k, d = 64, 96, 8
    b_np = (rng.random((m, k)) < 0.2).astype(np.float32)
    b = jnp.asarray(b_np.astype(jnp.bfloat16))
    bt = jnp.asarray(b_np.T.astype(jnp.bfloat16))
    x = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32))
    key = jax.random.PRNGKey(7)

    y = dropped_matmul(b, bt, x, key, 0.4)
    # reproduce the mask with the public helper and compare
    from igcn_cf_tpu.kernels.masked_matmul import _seed_from_key

    seed = _seed_from_key(key)
    want = np.asarray(_masked_mm_xla(b, x, seed, 0.4, swap=False))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-5)

    # gradient must use the SAME mask: d/dx sum(c * (B∘M)x) == (B∘M)^T c
    c = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    grad = jax.grad(lambda x: jnp.sum(c * dropped_matmul(b, bt, x, key, 0.4)))(x)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, k), 1)
    mask = np.asarray(_keep_mask(seed, rows, cols, 0.4))
    want_grad = (b_np * mask).T @ np.asarray(c)
    # bf16 matmul tolerance
    np.testing.assert_allclose(np.asarray(grad), want_grad, rtol=5e-2, atol=5e-2)


def test_feat_aggregate_matches_sparse_with_dropout_off(tiny_ds):
    """Already covered by test_dense_matches_sparse_rep; here check the
    dropout path keeps expectation ~ the non-dropped output."""
    g = BipartiteDense.build(tiny_ds.train_array, tiny_ds.n_users, tiny_ds.n_items)
    d = 8
    rng = np.random.default_rng(0)
    e_i = jnp.asarray(rng.normal(size=(tiny_ds.n_items, d)).astype(np.float32))
    e_u = jnp.asarray(rng.normal(size=(tiny_ds.n_users, d)).astype(np.float32))
    tok_u = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    tok_i = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    w_u = jnp.ones((tiny_ds.n_users,))
    w_i = jnp.ones((tiny_ds.n_items,))
    base = np.asarray(feat_aggregate(g, e_i, e_u, tok_u, tok_i, w_u, w_i))
    samples = []
    for s in range(32):
        samples.append(
            np.asarray(
                feat_aggregate(
                    g, e_i, e_u, tok_u, tok_i, w_u, w_i,
                    dropout=0.3, key=jax.random.PRNGKey(s),
                )
            )
        )
    mean = np.mean(samples, axis=0)
    # expectation preserved within sampling noise
    err = np.abs(mean - base).max() / (np.abs(base).max() + 1e-9)
    assert err < 0.25


def test_igcn_dense_training_runs(tmp_path, monkeypatch, tiny_ds):
    monkeypatch.chdir(tmp_path)
    model_cfg = {
        "name": "IGCN", "embedding_size": 16, "n_layers": 2,
        "dropout": 0.3, "feature_ratio": 1.0, "graph_backend": "dense",
    }
    cfg = {
        "name": "IGCNTrainer", "optimizer": "Adam", "lr": 1e-2, "l2_reg": 0.0,
        "aux_reg": 0.01, "batch_size": 128, "test_batch_size": 64,
        "topks": [10], "n_epochs": 3,
    }
    model = get_model(model_cfg, tiny_ds)
    trainer = get_trainer(cfg, tiny_ds, model)
    best = trainer.train(verbose=False)
    assert np.isfinite(best) and best > 0.0


def test_ngcf_propagate_dense_matches_sparse(tiny_ds):
    from igcn_cf_tpu.graph.build import l1_norm_adjacency_with_self_loops
    from igcn_cf_tpu.kernels.sparse import SparseGraph, spmm

    coo = l1_norm_adjacency_with_self_loops(
        tiny_ds.train_array, tiny_ds.n_users, tiny_ds.n_items
    )
    sg = SparseGraph.from_coo(coo)
    g = BipartiteDense.build(tiny_ds.train_array, tiny_ds.n_users, tiny_ds.n_items)
    x = jnp.asarray(
        np.random.default_rng(1)
        .normal(size=(tiny_ds.n_users + tiny_ds.n_items, 8))
        .astype(np.float32)
    )
    a = np.asarray(spmm(sg, x))
    b = np.asarray(ngcf_propagate(g, x))
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("name,extra", [
    ("NGCF", {"layer_sizes": [16, 16], "dropout": 0.0}),
    ("IMCGAE", {"n_layers": 2, "dropout": 0.0}),
])
def test_dense_matches_sparse_rep_ngcf_imcgae(tiny_ds, name, extra):
    cfg = {"name": name, "embedding_size": 16, **extra}
    rep_s, *_ = _rep(cfg, tiny_ds, "sparse")
    rep_d, *_ = _rep(cfg, tiny_ds, "dense")
    scale = np.abs(rep_s).max() + 1e-9
    np.testing.assert_allclose(rep_d / scale, rep_s / scale, atol=2e-2)


def test_ngcf_dense_training_runs(tmp_path, monkeypatch, tiny_ds):
    monkeypatch.chdir(tmp_path)
    model_cfg = {
        "name": "NGCF", "embedding_size": 16, "layer_sizes": [16, 16],
        "dropout": 0.2, "graph_backend": "dense",
    }
    cfg = {
        "name": "BPRTrainer", "optimizer": "Adam", "lr": 1e-2, "l2_reg": 1e-4,
        "batch_size": 128, "test_batch_size": 64, "topks": [10], "n_epochs": 2,
    }
    model = get_model(model_cfg, tiny_ds)
    trainer = get_trainer(cfg, tiny_ds, model)
    best = trainer.train(verbose=False)
    assert np.isfinite(best) and best > 0.0


def test_imcgae_dense_training_runs(tmp_path, monkeypatch, tiny_ds):
    monkeypatch.chdir(tmp_path)
    model_cfg = {
        "name": "IMCGAE", "embedding_size": 16, "n_layers": 2,
        "dropout": 0.3, "graph_backend": "dense",
    }
    cfg = {
        "name": "BPRTrainer", "optimizer": "Adam", "lr": 1e-2, "l2_reg": 0.0,
        "batch_size": 128, "test_batch_size": 64, "topks": [10], "n_epochs": 2,
    }
    model = get_model(model_cfg, tiny_ds)
    trainer = get_trainer(cfg, tiny_ds, model)
    best = trainer.train(verbose=False)
    assert np.isfinite(best) and best > 0.0
