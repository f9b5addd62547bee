"""Projected SHARDED propagation-cache numbers at the Amazon-book shape
(round-4 VERDICT item #3 'done' bar): measure the per-shard fused
gather+matmul kernels on ONE real chip at exactly the per-shard geometry an
8-chip table axis would give, and extend AMAZON_SCALE.json.

Why a projection: this environment has one TPU chip; the sharded cached
step runs the SAME kernel per chip on its local column slab of P plus one
(R, d) psum over ICI (parallel/pcache.py). The kernel time measured here IS
the per-chip propagation cost; the psum moves 3*batch*64*4 = 1.5 MB per
step (sub-0.1 ms at ICI bandwidths) and the remaining step pieces (feat
aggregation, loss, Adam) are the already-sharded recompute-path pieces.

Single-chip Amazon status (AMAZON_SCALE.json): P = ~42.5 GiB declines the
11 GiB budget -> recompute engine at 121.4 ms/step. Sharded: per-chip slab
= n x pad(rows_per_shard) x 2B ~ 5.9 GiB -> fits.

Run: python tools/amazon_sharded_projection.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from igcn_cf_tpu.kernels.pcache import GATHER_NJ, cached_prop
from igcn_cf_tpu.parallel.pcache import shard_slab_width
from igcn_cf_tpu.utils.timing import scan_ms, smin0

N_USERS, N_ITEMS = 52643, 91599
N_SHARDS = 8
BATCH = 2048
D = 64
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "AMAZON_SCALE.json")


def main():
    n = N_USERS + N_ITEMS
    rows_per_shard = -(-n // (N_SHARDS * 8)) * 8
    width = shard_slab_width(rows_per_shard)
    sub = width // GATHER_NJ // 128
    slab_gb = n * width * 2 / 2**30
    print(
        f"n={n} rows_per_shard={rows_per_shard} slab width={width} "
        f"({slab_gb:.2f} GiB/chip on {N_SHARDS})",
        flush=True,
    )

    # random slab with the exact sharded geometry; contents don't affect
    # kernel timing (the DMA stream reads the same bytes either way)
    key = jax.random.PRNGKey(0)
    kp, kr, kx, kc = jax.random.split(key, 4)
    p4 = jax.random.normal(kp, (n, GATHER_NJ, sub, 128), jnp.bfloat16)
    r_tot = 3 * BATCH
    rows = jax.random.randint(kr, (r_tot,), 0, n, dtype=jnp.int32)
    x0 = jax.random.normal(kx, (width, D), jnp.float32)
    ct = jax.random.normal(kc, (r_tot, D), jnp.float32)

    def fwd_bwd(s, p4a, rowsa, x0a, cta):
        r = rowsa + smin0(s)
        y, vjpf = jax.vjp(lambda x: cached_prop(p4a, r, x), x0a)
        (dx,) = vjpf(cta)
        return (y[0, 0] + dx[0, 0]) * 1e-20

    t0 = time.time()
    ms = scan_ms(fwd_bwd, p4, rows, x0, ct)
    print(f"per-shard fused fwd+bwd: {ms:.2f} ms (measured in "
          f"{time.time()-t0:.0f}s)", flush=True)

    # HBM floor for the per-shard piece: two passes (fwd + bwd) over the
    # gathered rows of the local slab
    floor_ms = 2 * r_tot * width * 2 / 819e9 * 1e3

    with open(OUT) as f:
        result = json.load(f)
    single_step_ms = result["step_ms"]
    # projected sharded cached step: measured per-shard kernel + the
    # recompute step's non-propagation residual shared across 8 chips.
    # The single-chip 121.4 ms step = K-layer bit-packed propagation
    # (dominant at this shape) + feat agg + loss/Adam; sharded, each chip
    # handles 1/8 of the feat/loss work and the cached kernel replaces the
    # propagation entirely. Upper bound the residual by single_step/8.
    projected_ms = ms + single_step_ms / N_SHARDS
    result["sharded_projection"] = {
        "n_shards": N_SHARDS,
        "slab_gib_per_chip": round(slab_gb, 2),
        "fits_budget": slab_gb < 11.0,
        "pcache_fwd_bwd_ms_measured": round(ms, 2),
        "pcache_fwd_bwd_floor_ms": round(floor_ms, 2),
        "psum_bytes_per_step": r_tot * D * 4,
        "projected_step_ms": round(projected_ms, 2),
        "projected_examples_per_s": round(BATCH / projected_ms * 1e3, 1),
        "note": (
            "per-shard kernel measured on one real chip at the exact "
            "8-shard slab geometry; residual (feat agg + loss + Adam) "
            "bounded by single-chip recompute step / n_shards; psum cost "
            "(1.5 MB/step over ICI) not included (<0.1 ms)"
        ),
    }
    print(json.dumps(result["sharded_projection"], indent=1), flush=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
