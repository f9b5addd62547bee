"""Soak test: IGCN at full Gowalla scale to convergence on one TPU chip.

Validates numerical stability, memory headroom and wall-clock convergence of
the dense engine at the reference's headline scale; appends results to
PARITY_RESULTS.json under 'IGCN_full_scale'."""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from igcn_cf_tpu.core.prng import set_seed
from igcn_cf_tpu.models.base import get_model
from igcn_cf_tpu.train.trainer import get_trainer


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, ".bench_dataset.pkl"), "rb") as f:
        ds = pickle.load(f)
    print(f"dataset: {ds.n_users} users {ds.n_items} items {len(ds)} interactions")
    set_seed(2021)
    model = get_model(
        {"name": "IGCN", "embedding_size": 64, "n_layers": 3,
         "dropout": 0.3, "feature_ratio": 1.0},
        ds,
    )
    trainer = get_trainer(
        {"name": "IGCNTrainer", "optimizer": "Adam", "lr": 1e-3, "l2_reg": 0.0,
         "aux_reg": 0.01, "n_epochs": 120, "batch_size": 2048,
         "test_batch_size": 512, "topks": [20], "val_interval": 5,
         "max_patience": 30, "state_interval": 10},
        ds,
        model,
    )
    t0 = time.time()
    best = trainer.train(verbose=True)
    res, metrics = trainer.eval("test")
    dt = time.time() - t0
    print(f"DONE best val NDCG@20 {best:.4f}; test {res}; {dt:.0f}s")

    path = os.path.join(root, "PARITY_RESULTS.json")
    results = {}
    if os.path.exists(path):
        with open(path) as f:
            results = json.load(f)
    results["IGCN_full_scale"] = {
        "val_ndcg20": float(best),
        "test": {m: {str(k): v for k, v in d.items()} for m, d in metrics.items()},
        "epochs": trainer.epoch + 1,
        "train_seconds": dt,
        "backend": model.backend,
    }
    with open(path, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
