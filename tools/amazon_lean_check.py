"""Amazon-book-scale check of the lean dense mode: build the 52,643 x 91,599
catalog (9.8 GiB int8 halves), confirm the auto backend picks 'dense_lean',
run a 30-step fused train scan and report examples/s + stability."""

from __future__ import annotations

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from igcn_cf_tpu.models.base import get_model
from igcn_cf_tpu.train.trainer import get_trainer

N_USERS, N_ITEMS, AVG_DEG = 52643, 91599, 40
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".amazon_scale.pkl")


def main():
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            ds = pickle.load(f)
    else:
        from igcn_cf_tpu.data.synthetic import synthetic_interactions

        t0 = time.time()
        ds = synthetic_interactions(
            n_users=N_USERS, n_items=N_ITEMS, avg_degree=AVG_DEG, seed=11,
            name="amazon_scale_synth",
        )
        print(f"generated in {time.time()-t0:.0f}s", flush=True)
        with open(CACHE, "wb") as f:
            pickle.dump(ds, f)
    print(f"{ds.n_users} users {ds.n_items} items {len(ds)} interactions", flush=True)

    model = get_model(
        {"name": "IGCN", "embedding_size": 64, "n_layers": 3,
         "dropout": 0.0, "feature_ratio": 1.0},
        ds,
    )
    print("backend:", model.backend, flush=True)
    trainer = get_trainer(
        {"name": "IGCNTrainer", "optimizer": "Adam", "lr": 1e-3, "l2_reg": 0.0,
         "aux_reg": 0.01, "n_epochs": 1, "batch_size": 2048,
         "test_batch_size": 512, "topks": [20]},
        ds, model,
    )
    trainer.steps_per_epoch = lambda: 30
    t0 = time.time()
    loss = trainer.train_one_epoch()
    print(f"warmup 30 steps (compile) {time.time()-t0:.0f}s loss {loss:.4f}", flush=True)
    t0 = time.time()
    loss = trainer.train_one_epoch()
    jax.block_until_ready(trainer.params["embedding"])
    dt = time.time() - t0
    print(f"30 steps in {dt:.2f}s -> {30*2048/dt:.0f} examples/s, loss {loss:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
