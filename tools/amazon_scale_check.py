"""Amazon-book-scale engine check: build the 52,643 x 91,599 catalog
(bit-packed B: 621 MB/orientation-free; P cache = 41.5 GB bf16 so the
propagation cache must DECLINE and the bit-packed recompute engine must
carry the step), run a 30-step fused train scan on the real chip, and write
the result to AMAZON_SCALE.json at the repo root.

This is the "beyond-pcache-budget catalogs stay on the bit-packed engine"
claim (kernels/pcache.py capacity gate) made into a committed artifact.
Reference scale: /root/reference/dataset.py:228-255 (Amazon-book parser);
52,643 x 91,599 is the INMO paper's Amazon-book split shape.
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from igcn_cf_tpu.models.base import get_model
from igcn_cf_tpu.train.trainer import get_trainer

N_USERS, N_ITEMS, AVG_DEG = 52643, 91599, 40
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".amazon_scale.pkl")
OUT = os.path.join(ROOT, "AMAZON_SCALE.json")
N_STEPS = 30
BATCH = 2048


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
    print(f"backend: {model.backend}, pcache: {model.pcache}", flush=True)
    trainer = get_trainer(
        {"name": "IGCNTrainer", "optimizer": "Adam", "lr": 1e-3, "l2_reg": 0.0,
         "aux_reg": 0.01, "n_epochs": 1, "batch_size": BATCH,
         "test_batch_size": 512, "topks": [20]},
        ds, model,
    )
    trainer.steps_per_epoch = lambda: N_STEPS
    t0 = time.time()
    loss = trainer.train_one_epoch()
    print(f"warmup {N_STEPS} steps (compile) {time.time()-t0:.0f}s "
          f"loss {loss:.4f}", flush=True)
    t0 = time.time()
    loss = trainer.train_one_epoch()
    # axon block_until_ready does not wait; the scan result (loss) above is a
    # D2H readback, so dt already covers device execution.
    dt = time.time() - t0
    ex_s = N_STEPS * BATCH / dt
    result = {
        "catalog": [ds.n_users, ds.n_items],
        "interactions": len(ds),
        "backend": model.backend,
        "pcache": bool(model.pcache),
        "steps": N_STEPS,
        "batch_size": BATCH,
        "step_ms": round(1000.0 * dt / N_STEPS, 2),
        "examples_per_s": round(ex_s, 1),
        "loss": round(float(loss), 4),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result), flush=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
