"""Mesh-shape scaling harness for the sharded INMO trainer.

Sweeps (data, table) mesh shapes over N devices, times the full sharded
epoch (device-side sampling, edge-partitioned SpMM with table-axis
collectives, BPR+aux, Adam) plus one sharded eval, and reports examples/s
per shape. Writes SCALING.json at the repo root.

On the virtual CPU mesh (default: JAX_PLATFORMS=cpu with
--xla_force_host_platform_device_count=8) the absolute numbers are
meaningless — what the harness validates is that every shape compiles,
runs, and that the ratios are visible; on a real multi-chip TPU slice the
same sweep reports true scaling efficiency (BASELINE.json: >=80% going
1 -> 8 hosts). Run on hardware with:

    python tools/scaling_harness.py            # all devices, all factorizations
    JAX_NUM_PROCESSES=.. JAX_PROCESS_ID=.. JAX_COORDINATOR_ADDRESS=..:1234 \
        python tools/scaling_harness.py        # multi-host (see README)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if "--tpu" not in sys.argv:
    # default to the virtual 8-device CPU mesh so the sweep runs anywhere.
    # The container may pin JAX_PLATFORMS to an accelerator and import jax
    # before this script (sitecustomize), so env vars are too late —
    # jax.config.update is what takes effect (same pattern as
    # tests/conftest.py); --tpu opts into real hardware.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
import numpy as np  # noqa: E402

from igcn_cf_tpu.core.mesh import initialize_distributed, make_mesh  # noqa: E402
from igcn_cf_tpu.data.synthetic import synthetic_interactions  # noqa: E402
from igcn_cf_tpu.parallel.trainer import ShardedIGCNTrainer  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "SCALING.json")


def shapes(n: int):
    out = []
    d = 1
    while d <= n:
        if n % d == 0:
            out.append((d, n // d))
        d *= 2
    return out


def main():
    initialize_distributed()
    n_dev = len(jax.devices())
    on_cpu = jax.default_backend() == "cpu"
    # small on CPU (compile cost dominates), Gowalla-quarter on hardware
    if on_cpu:
        ds = synthetic_interactions(
            n_users=512, n_items=768, avg_degree=12, seed=5, name="scaling_cpu"
        )
        batch, epochs_timed = 256, 2
    else:
        ds = synthetic_interactions(
            n_users=29858 // 4, n_items=40981 // 4, avg_degree=9, seed=5,
            name="scaling_q",
        )
        batch, epochs_timed = 2048, 3

    results = {
        "platform": jax.default_backend(),
        "n_devices": n_dev,
        "process_count": jax.process_count(),
        "dataset": {"users": ds.n_users, "items": ds.n_items, "nnz": len(ds)},
        "shapes": {},
    }
    base_rate = None
    for data, table in shapes(n_dev):
        tag = f"{data}x{table}"
        try:
            t0 = time.time()
            tr = ShardedIGCNTrainer(
                {"topks": [20], "n_epochs": 1, "val_interval": 1, "lr": 1e-3,
                 "aux_reg": 0.01, "batch_size": batch, "test_batch_size": 256},
                ds,
                make_mesh(jax.devices(), data=data, table=table),
                {"name": "IGCN", "embedding_size": 64, "n_layers": 3,
                 "dropout": 0.3, "feature_ratio": 1.0},
            )
            build_s = time.time() - t0
            tr.train_one_epoch()  # compile + warmup
            t0 = time.time()
            for _ in range(epochs_timed):
                tr.train_one_epoch()
            dt = (time.time() - t0) / epochs_timed
            steps = tr.train_state.steps_per_epoch
            rate = steps * batch / dt
            t0 = time.time()
            tr.eval("val")
            eval_s = time.time() - t0
            if base_rate is None:
                base_rate = rate
            results["shapes"][tag] = {
                "examples_per_s": round(rate, 1),
                "epoch_s": round(dt, 3),
                "eval_s": round(eval_s, 3),
                "build_s": round(build_s, 1),
                "speedup_vs_first": round(rate / base_rate, 3),
            }
            print(f"{tag:8s} {rate:12,.0f} ex/s  epoch {dt:.3f}s  "
                  f"eval {eval_s:.2f}s", flush=True)
        except Exception as e:  # a shape failing to compile IS the finding
            results["shapes"][tag] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{tag:8s} FAILED: {e}", flush=True)

    if jax.process_index() == 0:
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
