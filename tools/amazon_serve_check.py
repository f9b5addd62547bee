"""Amazon-book-scale SERVING check on the real chip: build the 52,643 x
91,599-shape... no — the INMO paper's Amazon-book split is 52,643 users x
91,599 items (tools/amazon_scale_check.py); serve it end-to-end: prepare the
Recommender (reps + on-device packed masks), measure steady-state inductive
refresh and request latency through the fused retrieval kernel, and extend
AMAZON_SCALE.json with a "serving" section.

Run: python tools/amazon_serve_check.py
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".amazon_scale.pkl")
OUT = os.path.join(ROOT, "AMAZON_SCALE.json")


def main():
    import jax

    from igcn_cf_tpu.models.base import get_model
    from igcn_cf_tpu.serve import Recommender

    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            ds = pickle.load(f)
    else:
        from igcn_cf_tpu.data.synthetic import synthetic_interactions

        ds = synthetic_interactions(
            n_users=52643, n_items=91599, avg_degree=40, seed=11,
            name="amazon_scale_synth",
        )
        with open(CACHE, "wb") as f:
            pickle.dump(ds, f)
    print(f"# {ds.n_users} x {ds.n_items}, {len(ds)} interactions", flush=True)

    cfg = {"name": "IGCN", "embedding_size": 64, "n_layers": 3,
           "dropout": 0.3, "feature_ratio": 1.0, "prop_cache": False}
    model = get_model(dict(cfg), ds)
    params = model.init_params(jax.random.PRNGKey(0))
    buffers = model.init_buffers()

    t0 = time.time()
    rec = Recommender(model, params, buffers, exclude="train")
    prep_s = time.time() - t0
    print(f"# prepare (compile + reps + masks): {prep_s:.1f}s", flush=True)

    refresh_s = rec.refresh(ds)
    print(f"# steady-state inductive refresh: {refresh_s:.2f}s", flush=True)

    rng = np.random.default_rng(0)
    lat = {}
    for req in (512, 4096):
        users = rng.integers(0, ds.n_users, req)
        rec.recommend(users, k=20)  # compile
        t0 = time.time()
        for _ in range(5):
            out = rec.recommend(users, k=20)
        dt = (time.time() - t0) / 5
        lat[str(req)] = {
            "latency_ms": round(dt * 1e3, 1),
            "users_per_s": round(req / dt, 1),
        }
        print(f"# request {req}: {dt*1e3:.1f} ms ({req/dt:,.0f} users/s)",
              flush=True)
        for row, u in zip(np.asarray(out[:32]), users[:32]):
            assert not set(row.tolist()) & set(ds.train[u]), "mask violated"

    with open(OUT) as f:
        result = json.load(f)
    result["serving"] = {
        "prepare_s": round(prep_s, 1),
        "refresh_steady_s": round(refresh_s, 2),
        "requests": lat,
        "note": (
            "full serving stack at the Amazon-book shape on one chip: "
            "on-device packed masks (~0.9 GB), fused retrieval kernel, "
            "train-interaction masking spot-verified"
        ),
    }
    print(json.dumps(result["serving"]), flush=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
