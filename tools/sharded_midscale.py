"""Mid-scale END-TO-END demonstration of the sharded propagation-cache
engine on the 8-device virtual CPU mesh -> SHARDED_MIDSCALE.json.

VERDICT r4 next #5: the sharded cached engine had only ever run end-to-end
at toy shapes; the Amazon number was a projection. This runs the REAL
sharded train step (parallel/steps.py, prop_cache slabs + fused gather +
psum) at ~64k nodes — per-shard slab 64k x 16384 bf16 = 2.1 GB, spanning 4
DMA-alignment blocks per shard — and asserts the cached trajectory tracks
the recompute engine step for step.

The P slabs build through the exact scipy host builder
(parallel/pcache.build_sharded_pcache_host; parity with the device builder
is pinned in tests/test_parallel.py) because the bit-packed device build's
CPU fallback would be O(n^2 * npad) dense FLOPs on this 2-core host. Step
times are reported for completeness but are NOT perf claims — 8 virtual
devices share 2 host cores; the perf story lives in BENCH/AMAZON_SCALE.

Run: python tools/sharded_midscale.py   (~10-25 min on the 2-core host)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "SHARDED_MIDSCALE.json")

N_USERS, N_ITEMS, AVG_DEG = 26000, 38000, 16
D, LAYERS, BATCH, STEPS = 32, 3, 1024, 5


def main():
    from igcn_cf_tpu.core.mesh import TABLE_AXIS, make_mesh
    from igcn_cf_tpu.data.synthetic import synthetic_interactions
    from igcn_cf_tpu.parallel.steps import build_inmo_sharded_train, make_batch

    t0 = time.time()
    ds = synthetic_interactions(
        n_users=N_USERS, n_items=N_ITEMS, avg_degree=AVG_DEG, seed=13,
        name="midscale_synth",
    )
    mesh = make_mesh(jax.devices()[:8], data=2, table=4)
    print(f"# dataset {ds.n_users}x{ds.n_items} ({len(ds)} interactions) "
          f"in {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    t_cache = build_inmo_sharded_train(
        ds, mesh, embedding_size=D, n_layers=LAYERS, dropout=0.0,
        lr=1e-3, l2_reg=0.0, aux_reg=0.01, batch_size=BATCH, seed=7,
        prop_cache="host",
    )
    build_cache_s = time.time() - t0
    p4 = t_cache.buffers["pcache"]
    slab_bytes = int(np.prod(p4.shape[1:])) * 2
    print(f"# sharded P built in {build_cache_s:.0f}s; per-shard slab "
          f"{slab_bytes/2**30:.2f} GiB, stacked shape {p4.shape}", flush=True)

    t0 = time.time()
    t_rec = build_inmo_sharded_train(
        ds, mesh, embedding_size=D, n_layers=LAYERS, dropout=0.0,
        lr=1e-3, l2_reg=0.0, aux_reg=0.01, batch_size=BATCH, seed=7,
        prop_cache=False,
    )
    build_rec_s = time.time() - t0

    rng = np.random.default_rng(4)
    batches = [make_batch(mesh, rng, ds, BATCH) for _ in range(STEPS)]
    pc, oc = t_cache.params, t_cache.opt_state
    pr, orr = t_rec.params, t_rec.opt_state
    losses, times = [], {"pcache": [], "recompute": []}
    for i, batch in enumerate(batches):
        key = jax.random.PRNGKey(i)
        t0 = time.time()
        pc, oc, lc = t_cache.step(pc, oc, t_cache.buffers, batch, key)
        lc = float(lc)
        times["pcache"].append(time.time() - t0)
        t0 = time.time()
        pr, orr, lr_ = t_rec.step(pr, orr, t_rec.buffers, batch, key)
        lr_ = float(lr_)
        times["recompute"].append(time.time() - t0)
        losses.append([round(lc, 6), round(lr_, 6)])
        print(f"# step {i}: cached {lc:.6f} vs recompute {lr_:.6f} "
              f"({times['pcache'][-1]:.1f}s / {times['recompute'][-1]:.1f}s)",
              flush=True)
        assert abs(lc - lr_) <= 2e-2 + 2e-2 * abs(lr_), (lc, lr_)

    ec = np.asarray(pc["embedding"])
    er = np.asarray(pr["embedding"])
    scale = float(np.abs(er).max()) + 1e-6
    max_dev = float(np.abs(ec - er).max() / scale)
    assert max_dev < 6e-2, max_dev

    result = {
        "platform": "virtual-cpu-mesh (8 devices / 2 host cores)",
        "mesh": {"data": 2, "table": int(mesh.shape[TABLE_AXIS])},
        "catalog": [ds.n_users, ds.n_items],
        "n_nodes": ds.n_users + ds.n_items,
        "interactions": len(ds),
        "embedding_size": D,
        "n_layers": LAYERS,
        "batch_size": BATCH,
        "per_shard_slab_bytes": slab_bytes,
        "stacked_pcache_shape": list(p4.shape),
        "build_cache_s": round(build_cache_s, 1),
        "build_recompute_s": round(build_rec_s, 1),
        "losses_cached_vs_recompute": losses,
        "embedding_max_rel_dev": round(max_dev, 5),
        "step_s_not_a_perf_claim": {
            k: [round(x, 2) for x in v] for k, v in times.items()
        },
        "note": (
            "End-to-end sharded propagation-cache training at a non-toy "
            "shape: real 2.1 GiB per-shard column slabs (multi-alignment-"
            "block layout math), fused gather + psum step, trajectory "
            "parity vs the recompute engine asserted step-by-step and on "
            "final embeddings. CPU-mesh wall times are functional evidence "
            "only."
        ),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"embedding_max_rel_dev": max_dev,
                      "per_shard_slab_gib": round(slab_bytes / 2**30, 2)}))
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
