"""Sharded propagation cache — the fused cached-operator engine on a
('data', 'table') mesh (round-4 VERDICT item #3).

Single-chip, the propagation cache P = mean_{k=0..K} A^k (kernels/pcache.py)
is the measured-fastest IGCN/LightGCN train engine, but P grows as n^2: at
the Amazon-book shape it is ~41.5 GiB and correctly declines the 11 GiB
single-chip budget (AMAZON_SCALE.json), forcing the slow recompute engine.
Sharding P over the table axis brings the per-chip slab under budget
(~5.2 GiB per chip on 8) and keeps the north-star config (INMO on
Amazon-book with sharded tables, BASELINE.json configs[4]) on the fast
engine.

Layout: P is SYMMETRIC (A is), so shard t's column slab

    P[:, ct]  (n, rows_per_shard)   ct = rows [t*rps, (t+1)*rps)

is its node-row block transposed — and stored in the SAME
(n, NJ, width/NJ/128, 128) slab layout the single-chip fused kernels
stream, so both kernels run UNCHANGED per shard:

    partial_t = P[rows, ct] @ X0[ct]      fused fwd on the local slab
    reps      = psum_t(partial_t)         one (R, d) psum over 'table'
    dX0[ct]   = P[rows, ct]^T @ d(reps)   fused bwd, shard-local, no
                                          extra collective (psum's VJP
                                          replicates d(reps))

X0[ct] is exactly the shard-local output of the sharded feat aggregation
(parallel/steps.py edge partition uses the same row blocks), padded with
zero rows from rows_per_shard up to the _ALIGN'd slab width. NOTE on the
padding columns (ADVICE r4 #2): ``build_prop_cache_cols`` builds the window
[t*rps, t*rps+width) of the GLOBAL P, so a shard's columns past rps are NOT
zeros — they are the next shard's real P columns (only columns >= n
propagate to zero). Correctness relies on the consumers zeroing the
OPERAND instead: ``cached_prop`` pads X0 with zero rows over
[rps, width), and the backward slices dx0[:rps] — so the overlap columns
multiply zeros forward and are discarded backward. The parity test
(tests/test_parallel.py sharded-pcache build oracle) pins both the overlap
contents and the zero-padded-X0 contract.

vs the recompute path (parallel/sharded.py): K edge-partitioned SpMMs with a
d-wide all-gather per layer PLUS a full-table rep all-gather; the cached
path touches only 3*batch rows of P per step and moves one (R, d) psum.

Build: each shard's slab is a column window of P built independently
(kernels/pcache.build_prop_cache_cols — same one-hot column-block
propagation through the bit-packed engine), assembled host-side and
device_put onto the mesh. Ref hot path being replaced:
/root/reference/model.py:434-446.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from igcn_cf_tpu.core.mesh import TABLE_AXIS
from igcn_cf_tpu.kernels.dense_graph import BipartiteDense
from igcn_cf_tpu.kernels.pcache import (
    _ALIGN,
    GATHER_NJ,
    PCACHE_BUDGET_BYTES,
    build_prop_cache_cols,
)


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def shard_slab_width(rows_per_shard: int) -> int:
    """Per-shard slab column width: the shard's node-row count padded to the
    fused-kernel DMA alignment."""
    return _pad_to(rows_per_shard, _ALIGN)


def sharded_pcache_bytes_per_chip(n_users: int, n_items: int,
                                  n_shards: int) -> int:
    """Per-chip slab bytes, computed with the SAME rows_per_shard formula the
    build actually receives (ShardedGraph.from_coo: ceil(n/(T*8))*8 — up to 7
    rows larger than ceil(n/T)); using the smaller estimate could approve a
    cache whose real slab is one _ALIGN column block (~n*8KB) larger than
    budgeted when the two straddle an alignment boundary (ADVICE r4 #3)."""
    n = n_users + n_items
    rps = _pad_to(n, n_shards * 8) // n_shards
    return n * shard_slab_width(rps) * 2


def sharded_pcache_fits(n_users: int, n_items: int, n_shards: int,
                        budget: int = PCACHE_BUDGET_BYTES) -> bool:
    """Capacity gate for the sharded cache (per-chip slab vs the same HBM
    budget the single-chip gate uses). The single-chip engine A/B measured
    the fused cached step at ~8x the recompute step's throughput at the
    flagship shape (BENCH_r04 init_ab_ms), and the sharded step only adds
    one (R, d) psum on top of the same per-shard kernels, so capacity — not
    a re-measured A/B, which would need real multi-chip hardware — gates the
    sharded engine. tools/amazon_scale_check.py measures the per-shard
    kernel piece at the Amazon shape on one real chip as the projection."""
    return sharded_pcache_bytes_per_chip(
        n_users, n_items, n_shards
    ) <= budget


def build_sharded_pcache_host(
    train_array: np.ndarray,
    n_users: int,
    n_items: int,
    mesh: Mesh,
    n_layers: int,
    rows_per_shard: int,
    block: int = 2048,
) -> jnp.ndarray:
    """Host-side (scipy CSR) build of the SAME stacked sharded cache layout
    as ``build_sharded_pcache`` — exact f32 column propagation, stored bf16.

    Purpose: mid-scale demonstrations on the virtual CPU mesh (VERDICT r4
    next #5). The device build routes every column block through the
    bit-packed engine, whose CPU fallback materializes the dense unpacked
    interaction matrix per matmul — fine on TPU, O(n^2 * npad) dense FLOPs
    on a 2-core CPU host. The sparse host build is O(nnz * npad) and
    bit-compatible modulo bf16 rounding (parity pinned in
    tests/test_parallel.py)."""
    import scipy.sparse as sp

    n = n_users + n_items
    n_shards = mesh.shape[TABLE_AXIS]
    width = shard_slab_width(rows_per_shard)
    sub = width // 128 // GATHER_NJ
    arr = np.asarray(train_array)
    rows = np.concatenate([arr[:, 0], n_users + arr[:, 1]])
    cols = np.concatenate([n_users + arr[:, 1], arr[:, 0]])
    a = sp.csr_matrix(
        (np.ones(rows.shape[0], np.float32), (rows, cols)), shape=(n, n)
    )
    deg = np.maximum(np.asarray(a.sum(axis=1)).ravel(), 1.0)
    s = (1.0 / np.sqrt(deg)).astype(np.float32)
    a = sp.diags(s) @ a @ sp.diags(s)
    a = a.tocsr().astype(np.float32)
    inv = np.float32(1.0 / (n_layers + 1))

    sh = NamedSharding(mesh, P(TABLE_AXIS, None, None, None, None))
    shape = (n_shards, n, GATHER_NJ, sub, 128)
    built: dict = {}

    def _build_shard(t: int) -> np.ndarray:
        col0 = t * rows_per_shard
        slab = np.zeros((n, width), dtype=jnp.bfloat16.dtype)
        for b0 in range(0, width, block):
            w = min(block, width - b0)
            g0 = col0 + b0
            # one-hot columns; global ids >= n propagate to zero
            live = max(0, min(w, n - g0))
            if live == 0:
                continue
            x = np.zeros((n, w), np.float32)
            x[np.arange(g0, g0 + live), np.arange(live)] = 1.0
            acc = x * inv
            for _ in range(n_layers):
                x = a @ x
                acc += x * inv
            slab[:, b0 : b0 + w] = acc.astype(jnp.bfloat16.dtype)
        return slab.reshape(n, GATHER_NJ, sub, 128)[None]

    def cb(index):
        t = index[0].start or 0
        if t not in built:
            built[t] = _build_shard(t)
        return built[t]

    return jax.make_array_from_callback(shape, sh, cb)


def build_sharded_pcache(
    bip: BipartiteDense,
    mesh: Mesh,
    n_layers: int,
    rows_per_shard: int,
) -> jnp.ndarray:
    """Stacked sharded cache: a (T, n, NJ, width/NJ/128, 128) bf16 array with
    the leading axis sharded over 'table' — shard t holds the column window
    P[:, t*rows_per_shard : ...] in slab layout. ``rows_per_shard`` must
    match the node-row partition of the sharded graph (parallel/sharded.py)
    so X0's shard-local rows line up with the slab columns."""
    n_shards = mesh.shape[TABLE_AXIS]
    n = bip.n_users + bip.n_items
    width = shard_slab_width(rows_per_shard)
    sub = width // 128 // GATHER_NJ
    sh = NamedSharding(mesh, P(TABLE_AXIS, None, None, None, None))
    shape = (n_shards, n, GATHER_NJ, sub, 128)

    # build lazily per ADDRESSABLE shard (multi-host builds only local
    # blocks; a full host-side stack of P would defeat the sharding)
    built: dict = {}

    def cb(index):
        t = index[0].start or 0
        if t not in built:
            built[t] = np.asarray(
                build_prop_cache_cols(bip, n_layers, t * rows_per_shard, width)
            )[None]
        return built[t]

    return jax.make_array_from_callback(shape, sh, cb)
