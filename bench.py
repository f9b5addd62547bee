"""Benchmark: INMO (IGCN) fused training + retrieval-eval throughput on one
TPU chip.

Train metric (the headline, SURVEY.md §3.1 roofline path): per train step —
on-device negative sampling, INMO feature aggregation over the bit-packed
interaction matrix with edge dropout, 3-layer adjacency propagation (through
the precomputed-P cache, kernels/pcache.py, when it fits HBM; bit-packed
matmul recompute otherwise), BPR + auxiliary loss, backward, Adam — all fused
in one jitted lax.scan, on a Gowalla-scale synthetic dataset (29,858 users x
40,981 items, ~833k train interactions after the 70% split + dedupe; the INMO
paper's Gowalla split shape).

Eval metric: masked full-catalog top-k retrieval (evaluation/evaluate.py —
cached eval representations, exclusion scatter, device top-k, vectorized
Precision/Recall/NDCG), reported as users/s over the full user set
(BASELINE.json "eval users/s").

Baseline: the reference trains LightGCN on Gowalla in 8007.1s full retrain
(reference run/plot.py:200-201, single CUDA GPU). At its 1000-epoch budget x
1,027,464 interactions that is ~128k interactions/s upper bound for the
reference pipeline (early stopping makes the true number lower, so this is a
conservative baseline). vs_baseline = ours / 128k.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
supplementary fields (step_ms, eval_users_per_s, engine).
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

import numpy as np

BENCH_USERS = 29858
BENCH_ITEMS = 40981
BENCH_AVG_DEG = 34.4  # ~1.03M raw events -> ~833k train rows after split
BATCH_SIZE = 2048
N_STEPS = 200
BASELINE_EXAMPLES_PER_S = 128_000.0

CACHE = os.path.join(os.path.dirname(__file__), ".bench_dataset.pkl")


def _bench_dataset():
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            return pickle.load(f)
    from igcn_cf_tpu.data.synthetic import synthetic_interactions

    ds = synthetic_interactions(
        n_users=BENCH_USERS,
        n_items=BENCH_ITEMS,
        avg_degree=BENCH_AVG_DEG,
        seed=2021,
        name="gowalla_scale_synth",
    )
    with open(CACHE, "wb") as f:
        pickle.dump(ds, f)
    return ds


def main():
    import jax

    from igcn_cf_tpu.models.base import get_model
    from igcn_cf_tpu.train.trainer import get_trainer

    t0 = time.time()
    ds = _bench_dataset()
    print(
        f"# dataset ready in {time.time()-t0:.1f}s: {ds.n_users} users, "
        f"{ds.n_items} items, {len(ds)} interactions",
        file=sys.stderr,
    )

    t0 = time.time()
    model = get_model(
        {
            "name": "IGCN",
            "embedding_size": 64,
            "n_layers": 3,
            "dropout": 0.3,
            "feature_ratio": 1.0,
        },
        ds,
    )
    trainer = get_trainer(
        {
            "name": "IGCNTrainer",
            "optimizer": "Adam",
            "lr": 1e-3,
            "l2_reg": 0.0,
            "aux_reg": 0.01,
            "n_epochs": 1,
            "batch_size": BATCH_SIZE,
            "test_batch_size": 512,
            "topks": [20],
        },
        ds,
        model,
    )
    engine = "pcache" if getattr(model, "pcache", False) else model.backend
    print(
        f"# model+buffers ready in {time.time()-t0:.1f}s (engine: {engine})",
        file=sys.stderr,
    )

    # fixed-size measured epoch: N_STEPS batches per scan
    trainer.steps_per_epoch = lambda: N_STEPS
    t0 = time.time()
    trainer.train_one_epoch()  # compile + warmup
    print(f"# warmup (compile) {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    loss = trainer.train_one_epoch()
    jax.block_until_ready(trainer.params["embedding"])
    dt = time.time() - t0
    examples_per_s = N_STEPS * BATCH_SIZE / dt
    step_ms = 1000.0 * dt / N_STEPS
    print(
        f"# measured {N_STEPS} steps in {dt:.2f}s ({step_ms:.2f} ms/step, "
        f"loss {loss:.4f}) on {jax.devices()[0].platform}",
        file=sys.stderr,
    )

    # retrieval-eval throughput: full-catalog masked top-k + metrics over all
    # users (first call compiles; second is the measurement)
    trainer.eval("val")
    t0 = time.time()
    trainer.eval("val")
    eval_dt = time.time() - t0
    eval_users_per_s = ds.n_users / eval_dt
    print(
        f"# eval pass over {ds.n_users} users in {eval_dt:.2f}s "
        f"({eval_users_per_s:,.0f} users/s)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "igcn_train_examples_per_s_per_chip",
                "value": round(examples_per_s, 1),
                "unit": "interactions/s",
                "vs_baseline": round(examples_per_s / BASELINE_EXAMPLES_PER_S, 3),
                "step_ms": round(step_ms, 2),
                "eval_users_per_s": round(eval_users_per_s, 1),
                "engine": engine,
            }
        )
    )


if __name__ == "__main__":
    main()
