"""Propagation cache — precomputed ``P = mean_{k=0..K} A^k`` for models whose
propagation operator is FIXED across training, with a fused Pallas
gather+matmul train-step kernel.

Why this exists (the round-2/3 perf unlock): the reference recomputes
full-graph K-layer propagation for every 2048-interaction batch (reference
model.py:434-446 for IGCN, model.py:95-106 for LightGCN) and only then
gathers the ~6k batch rows. On TPU the per-batch propagation is 12-16
bit-packed matmul passes whose output width is the embedding dim d=64 — half
the 128-wide MXU idles, so the dense recompute formulation is compute-bound
above the baseline step time no matter how good the kernel is.

But for IGCN the per-batch edge dropout applies ONLY to the feature matrix
(reference model.py:435); the K-layer propagation runs over the fixed
``norm_adj`` with a mean over layers 0..K, and the per-epoch alpha anneal
(reference model.py:374-381) only rescales feat rows. LightGCN has no dropout
at all. So the linear operator

    P = (A^0 + A^1 + ... + A^K) / (K + 1),      A = D^-1/2 [[0,B],[B^T,0]] D^-1/2

is constant for the entire training run. We precompute P ONCE (column-blocked
through the bit-packed engine — seconds, not minutes), store it in HBM as
bfloat16, and each train step only computes

    rows  = [users, n_users+pos, n_users+neg]          (3·batch ids)
    reps  = P[rows] @ X0                                (forward)
    dX0   = P[rows]^T @ d(reps)                         (backward)

A is symmetric, so P is symmetric and the SAME rows serve forward and
backward.

The fused kernels (round 3): XLA executes gather-then-dot as materialize
``P[rows]`` (871 MB at Gowalla scale) + re-read it in the dot — measured
~39.5 ms/step against a ~2.2 ms two-pass roofline (round-2 VERDICT). The
Pallas kernels below never materialize the gathered block: each grid step
DMAs TR row slabs from P in HBM straight into a double-buffered VMEM scratch
and feeds the MXU. To make a row slab a SINGLE contiguous DMA (Mosaic cannot
slice one row of a (8,128)-tiled 2D memref), P is stored 4-D:

    P4[n, NJ, npad/NJ/128, 128],  row r / column c  ->  P4[r, j, w, l]
    with c = j * (npad/NJ) + w * 128 + l

i.e. a plain reshape of the logical (n, npad) matrix; each (row, j) pair is
one contiguous (npad/NJ/128, 128) slab. Forward: grid (R/TR, NJ), each step
DMAs TR slabs (double-buffered against the previous step's matmuls), then
runs ONE flat big-K dot ``slab.reshape(TR, tkc) @ X0_block`` and accumulates
over j in a VMEM scratch. Backward runs the same stream contracted on dim 0
(P symmetric => gathered rows double as the needed columns) as ONE flat dot
``ct^T (d, TR) @ slab.reshape(TR, tkc)`` into a (d, npad) output transposed
once outside.

Kernel-shape history (why the flat dot): the round-2 kernels looped over the
slab's 144 column tiles with small (TR,128)@(128,d) dots — a serial chain of
~109-cycle M-streaming MXU passes (fwd 3.2 ms, bwd 9.4 ms). Round 3 replaced
the bwd loop with one 3-D ``dot_general`` (2.03 ms); round 4 found Mosaic
compiles an in-kernel ``slab.reshape(TR, sub*128)`` essentially for free,
unlocking a single 2-D dot with K=18432 for BOTH directions: fwd 3.2->1.28 ms,
bwd 2.03->1.22 ms vs the 1.11 ms one-pass HBM roofline
(KERNEL_FINDINGS.md). Independent-accumulator
splitting and batched dot_general forms were measured slower or failed to
compile (KERNEL_FINDINGS.md).

Numerics: P is stored in bfloat16 (relative error <= 2^-9 per entry; the
training matmuls already run their inputs in bfloat16). The backward uses the
same bf16 P, so gradients are exact FOR the forward actually computed.
EVALUATION keeps the exact bit-packed propagate path — metrics never see the
cached operator. End-to-end metric parity vs the exact engine is asserted in
tests/test_pcache.py (train-path parity) and measured in bench.py's engine
A/B.

Engine selection is MEASURED, not assumed (the round-2 lesson: the unmeasured
pcache default shipped as a 29% regression). ``use_pcache`` gates statically
on capacity; on TPU with 'auto', the model init then times the cached step
piece against the recompute step piece (``ab_select``) and keeps the cache
only if it wins, memoizing the verdict on disk per shape.
"""

from __future__ import annotations

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from igcn_cf_tpu.kernels.dense_graph import BipartiteDense, sym_norm_propagate

# Peak-HBM model behind the budget (v5e: 16 GB physical):
#   P (this gate)                <= 11.0 GiB
#   bit-packed B (both feat orientations, Gowalla-class)   ~0.7 GiB
#   params + Adam state + grads (table d=64, f32, x4)      ~0.1 GiB
#   X0 / reps / eval reps (n x d f32, a few copies)        ~0.1 GiB
#   fused-kernel transients: none in HBM (row slabs stream
#   through VMEM; P[rows] is never materialized)            0
#   XLA workspace + fragmentation slack                    ~4.1 GiB
# Catalogs whose P exceeds the gate (e.g. Amazon-book, ~41.5 GiB) stay on
# the bit-packed recompute engine (see tools/amazon_scale_check.py).
PCACHE_BUDGET_BYTES = 11 * 1024**3

# Column-block width for the build: one MXU lane width. Wider blocks hit the
# 16 MB scoped-VMEM limit in the bit-packed transpose kernel (its out/acc
# blocks are (TK=4096, width) f32).
BUILD_BLOCK = 128

# Fused-kernel geometry: TR gathered rows per grid step, NJ column slabs.
# VMEM at Gowalla scale (npad=73728, NJ=4): row slab double-buffer
# 2*TR*(npad/NJ)*2B = 9.4 MB + X0 column block (npad/NJ, d) bf16 = 2.4 MB.
GATHER_TR = 128
GATHER_NJ = 4
# npad alignment: each per-row DMA slab is (1, 1, sub, 128) of a (8,128)-tiled
# HBM memref, so sub = npad/NJ/128 must be a multiple of 8 (Mosaic: "slice
# shape along dimension 2 must be aligned to tiling (8)").
_ALIGN = GATHER_NJ * 128 * 8


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def pcache_bytes(n_users: int, n_items: int) -> int:
    n = n_users + n_items
    return n * _pad_to(n, _ALIGN) * 2


def pcache_fits(n_users: int, n_items: int,
                budget: int = PCACHE_BUDGET_BYTES) -> bool:
    return pcache_bytes(n_users, n_items) <= budget


def use_pcache(n_users: int, n_items: int, n_layers: int,
               requested="auto") -> bool:
    """Static (capacity) gate for training through the cache. 'auto' = TPU
    with the cache in budget — the model init then confirms with a measured
    A/B (``ab_select``); True forces it (tests build tiny caches on CPU
    through the XLA fallback; on an accelerator an over-budget force raises
    instead of OOMing mid-build); False disables."""
    if requested is True:
        if n_layers < 1:
            return False
        if jax.default_backend() != "cpu" and not pcache_fits(n_users, n_items):
            raise ValueError(
                f"prop_cache=True but P would be "
                f"{pcache_bytes(n_users, n_items) / 2**30:.1f} GiB "
                f"(budget {PCACHE_BUDGET_BYTES / 2**30:.1f} GiB) — too large "
                f"for device HBM; use prop_cache='auto' or False"
            )
        return True
    if requested is not False and requested != "auto":
        raise ValueError(f"unknown prop_cache setting {requested!r}")
    return (
        requested == "auto"
        and n_layers >= 1
        and jax.default_backend() == "tpu"
        and pcache_fits(n_users, n_items)
    )


# -- build ---------------------------------------------------------------------


def build_prop_cache(g: BipartiteDense, n_layers: int,
                     block: int = BUILD_BLOCK) -> jnp.ndarray:
    """P = mean_{k=0..K} A^k as an (n, NJ, npad/NJ/128, 128) bfloat16 array
    (the fused-kernel slab layout; reshape to (n, npad) recovers the logical
    matrix). Built one 128-wide column block at a time: x = I[:, c0:c0+128]
    one-hot, K sym-norm propagate passes through the bit-packed engine,
    accumulated in f32, written bf16 via a donated dynamic_update_slice (in
    place; the multi-GB buffer is never copied)."""
    n = g.n_users + g.n_items
    return build_prop_cache_cols(g, n_layers, 0, _pad_to(n, _ALIGN),
                                 block=block)


def build_prop_cache_cols(g: BipartiteDense, n_layers: int, col_start: int,
                          col_width: int,
                          block: int = BUILD_BLOCK) -> jnp.ndarray:
    """Column window [col_start, col_start+col_width) of P in the slab
    layout: an (n, NJ, col_width/NJ/128, 128) bf16 array. ``col_width`` must
    be a multiple of ``_ALIGN``. This is the per-shard build of the SHARDED
    propagation cache (parallel/pcache.py): P is symmetric, so shard t's
    column slab P[:, ct] doubles as its row block P[ct, :]^T, and the fused
    gather kernels run unchanged on the local slab. Columns >= n (padding)
    propagate to zero."""
    n = g.n_users + g.n_items
    npad = col_width
    assert npad % _ALIGN == 0, (npad, _ALIGN)
    assert npad % (GATHER_NJ * 128) == 0 and block == 128
    sub = npad // GATHER_NJ // 128
    inv = 1.0 / float(n_layers + 1)

    # 16 column blocks per dispatch (one compile, traced offsets, donated
    # buffer): the round-2 per-block python loop paid ~576 sequential remote
    # dispatches — dispatch latency, not compute, dominated its 144 s. (A
    # single fori_loop over ALL blocks crashes the remote compiler at the
    # 10.9 GB carry, so the loop is chunked python-side.)
    # words per j is a multiple of 8 (_ALIGN), so chunk=8 always divides;
    # prefer 16 when it does. A chunk never crosses a j boundary.
    chunk = 16 if (npad // GATHER_NJ) % (16 * block) == 0 else 8
    assert (npad // GATHER_NJ) % (chunk * block) == 0

    @partial(jax.jit, donate_argnums=(0,))
    def fill(p4, bip, c0):
        for k in range(chunk):
            ck = c0 + k * block
            rows = jax.lax.broadcasted_iota(jnp.int32, (n, block), 0)
            # ck indexes the LOCAL column window; the one-hot targets the
            # GLOBAL node id col_start + ck
            cols = (
                jax.lax.broadcasted_iota(jnp.int32, (n, block), 1)
                + ck + col_start
            )
            # one-hot columns past n propagate to zero (no edges), so the
            # last partial block writes zeros there — harmless padding.
            x = (rows == cols).astype(jnp.float32)
            acc = x * inv
            for _ in range(n_layers):
                x = sym_norm_propagate(bip, x)
                acc = acc + x * inv
            # column block ck lands at slab j = ck // (npad/NJ), word
            # w = (ck % (npad/NJ)) // 128
            j = ck // (npad // GATHER_NJ)
            w = jax.lax.rem(ck, npad // GATHER_NJ) // 128
            p4 = jax.lax.dynamic_update_slice(
                p4, acc.astype(jnp.bfloat16).reshape(n, 1, 1, block),
                (0, j, w, 0),
            )
        return p4

    p4 = jnp.zeros((n, GATHER_NJ, sub, 128), jnp.bfloat16)
    for c0 in range(0, npad, chunk * block):
        p4 = fill(p4, g, jnp.int32(c0))
    return p4


def pcache_to_2d(p4: jnp.ndarray) -> jnp.ndarray:
    """The logical (n, npad) view (tests/debug; a relayout copy on TPU)."""
    n, nj, sub, lanes = p4.shape
    return p4.reshape(n, nj * sub * lanes)


# -- fused gather+matmul kernels -------------------------------------------------


def _fused_fwd(p4, rows, x0b, *, tr, interpret=False):
    """reps[r] = sum_j P4[rows[r], j] · X0[j-block]  — (R, d) f32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, nj, sub, lanes = p4.shape
    tkc = sub * lanes
    npad = nj * tkc
    d = x0b.shape[1]
    r_tot = rows.shape[0]
    ni = r_tot // tr
    nsteps = ni * nj

    def dma(p_hbm, slab, sems, rows_ref, slot, i, j, r):
        return pltpu.make_async_copy(
            p_hbm.at[pl.ds(rows_ref[i * tr + r], 1), j],
            slab.at[slot, pl.ds(r, 1)],
            sems.at[slot, r],
        )

    def kernel(rows_ref, p_hbm, x0_ref, out_ref, slab, acc, sems):
        i, j = pl.program_id(0), pl.program_id(1)
        step = i * nj + j
        slot = jax.lax.rem(step, 2)
        nstep = step + 1
        nslot = jax.lax.rem(nstep, 2)
        ni_, nj_ = jax.lax.div(nstep, nj), jax.lax.rem(nstep, nj)

        @pl.when(step == 0)
        def _():
            for r in range(tr):
                dma(p_hbm, slab, sems, rows_ref, 0, i, j, r).start()

        @pl.when(nstep < nsteps)
        def _():
            for r in range(tr):
                dma(p_hbm, slab, sems, rows_ref, nslot, ni_, nj_, r).start()

        for r in range(tr):
            dma(p_hbm, slab, sems, rows_ref, slot, i, j, r).wait()

        # one flat big-K dot: the in-kernel reshape is near-free (Mosaic
        # relayout) and runs 2.5x faster than the per-column-tile loop
        # (KERNEL_FINDINGS.md: 1.28 vs 3.2 ms)
        part = jnp.dot(
            slab[slot].reshape(tr, tkc),
            x0_ref[:],
            preferred_element_type=jnp.float32,
        )

        @pl.when(j == 0)
        def _():
            acc[:] = part

        @pl.when(j > 0)
        def _():
            acc[:] = acc[:] + part

        @pl.when(j == nj - 1)
        def _():
            out_ref[:] = acc[:]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ni, nj),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tkc, d), lambda i, j, rows_ref: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tr, d), lambda i, j, rows_ref: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tr, sub, lanes), jnp.bfloat16),
                pltpu.VMEM((tr, d), jnp.float32),
                pltpu.SemaphoreType.DMA((2, tr)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((r_tot, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_tot * npad * d,
            bytes_accessed=r_tot * npad * 2 + ni * npad * d * 2 + r_tot * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rows, p4, x0b)


def _fused_bwd(p4, rows, ctb, *, tr, interpret=False):
    """dX0^T as a flat (d, npad) block — the same row stream as the forward,
    contracted on dim 0 (P symmetric): ONE flat dot per grid step,
    ``ct^T (d, tr) @ slab.reshape(tr, tkc)``, accumulated into the (d, tkc)
    output block for column slab j. The in-kernel reshape is near-free and
    beats both the round-2 per-column-tile loop (9.4 ms) and the round-3
    3-D ``dot_general`` with 4-D output (2.03 ms): 1.22 ms vs the 1.11 ms
    one-pass HBM roofline (KERNEL_FINDINGS.md). The caller transposes
    (d, npad) -> (npad, d) once outside."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, nj, sub, lanes = p4.shape
    tkc = sub * lanes
    npad = nj * tkc
    d = ctb.shape[1]
    r_tot = rows.shape[0]
    ni = r_tot // tr
    nsteps = nj * ni

    def dma(p_hbm, slab, sems, rows_ref, slot, i, j, r):
        return pltpu.make_async_copy(
            p_hbm.at[pl.ds(rows_ref[i * tr + r], 1), j],
            slab.at[slot, pl.ds(r, 1)],
            sems.at[slot, r],
        )

    def kernel(rows_ref, p_hbm, ct_ref, out_ref, slab, sems):
        j, i = pl.program_id(0), pl.program_id(1)
        step = j * ni + i
        slot = jax.lax.rem(step, 2)
        nstep = step + 1
        nslot = jax.lax.rem(nstep, 2)
        nj_, ni_ = jax.lax.div(nstep, ni), jax.lax.rem(nstep, ni)

        @pl.when(step == 0)
        def _():
            for r in range(tr):
                dma(p_hbm, slab, sems, rows_ref, 0, i, j, r).start()

        @pl.when(nstep < nsteps)
        def _():
            for r in range(tr):
                dma(p_hbm, slab, sems, rows_ref, nslot, ni_, nj_, r).start()

        for r in range(tr):
            dma(p_hbm, slab, sems, rows_ref, slot, i, j, r).wait()

        ct_t = ct_ref[:].T  # (d, tr) — one transpose per grid step
        part = jnp.dot(
            ct_t, slab[slot].reshape(tr, tkc),
            preferred_element_type=jnp.float32,
        )  # (d, tkc)

        @pl.when(i == 0)
        def _():
            out_ref[:] = part

        @pl.when(i > 0)
        def _():
            out_ref[:] = out_ref[:] + part

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nj, ni),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tr, d), lambda j, i, rows_ref: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((d, tkc), lambda j, i, rows_ref: (0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tr, sub, lanes), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, tr)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((d, npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_tot * npad * d,
            bytes_accessed=r_tot * npad * 2 + r_tot * d * 2 + npad * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rows, p4, ctb)


def _bwd_to_2d(out2: jnp.ndarray) -> jnp.ndarray:
    """(d, npad) -> (npad, d): one XLA transpose outside the kernel."""
    return out2.T


def _pad_rows_to(x, n_pad):
    if x.shape[0] == n_pad:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((n_pad - x.shape[0],) + x.shape[1:], x.dtype)], axis=0
    )


def _use_pallas(p4) -> bool:
    return jax.default_backend() == "tpu" and p4.shape[3] == 128


def _cp_fwd_impl(p4, rows, x0):
    n, nj, sub, lanes = p4.shape
    npad = nj * sub * lanes
    r = rows.shape[0]
    x0b = _pad_rows_to(x0, npad).astype(jnp.bfloat16)
    if _use_pallas(p4):
        rp = _pad_to(r, GATHER_TR)
        rows_p = _pad_rows_to(rows, rp)
        return _fused_fwd(p4, rows_p, x0b, tr=GATHER_TR)[:r]
    g = pcache_to_2d(p4)[rows]
    return jnp.dot(g, x0b, preferred_element_type=jnp.float32)


def _cp_bwd_impl(p4, rows, ct):
    ctb = ct.astype(jnp.bfloat16)
    if _use_pallas(p4):
        r = rows.shape[0]
        rp = _pad_to(r, GATHER_TR)
        if rp != r:
            # padded rows must contribute nothing: zero their cotangent
            # (padded row ids alias row 0)
            ctb = _pad_rows_to(ctb, rp)
            rows = _pad_rows_to(rows, rp)
        return _bwd_to_2d(_fused_bwd(p4, rows, ctb, tr=GATHER_TR))
    g = pcache_to_2d(p4)[rows]
    return jax.lax.dot_general(
        g, ctb,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@jax.custom_vjp
def cached_prop(p4: jnp.ndarray, rows: jnp.ndarray, x0: jnp.ndarray):
    """reps = P[rows] @ X0 without ever materializing P[rows] (fused Pallas
    gather+matmul on TPU; gather-then-dot XLA fallback elsewhere). ``p4`` is
    the (n, NJ, sub, 128) bf16 cache and non-differentiable; ``rows`` is (R,)
    int32; ``x0`` is (n or npad, d) f32. The backward contracts the SAME row
    stream on dim 0 (P symmetric)."""
    return _cp_fwd_impl(p4, rows, x0)


def _cp_fwd(p4, rows, x0):
    return _cp_fwd_impl(p4, rows, x0), (p4, rows, x0.shape[0])


def _cp_bwd(res, ct):
    p4, rows, n = res
    dx0 = _cp_bwd_impl(p4, rows, ct)
    return None, None, dx0[:n].astype(jnp.float32)


cached_prop.defvjp(_cp_fwd, _cp_bwd)


# -- measured engine A/B ---------------------------------------------------------

AB_MEMO_PATH = os.path.join(
    os.path.expanduser("~"), ".cache", "igcn_cf_tpu", "engine_ab.json"
)


def _ab_version() -> str:
    """DERIVED memo version: hash of the fused-kernel sources + geometry
    constants. Any kernel edit (or TR/NJ retune) changes the key, so a stale
    disk verdict can never be silently reused — the round-3 scheme was a
    hand-bumped string a future edit could forget (VERDICT r3 weak #7)."""
    import hashlib
    import inspect

    from igcn_cf_tpu.kernels import bitpack

    src = inspect.getsource(_fused_fwd) + inspect.getsource(_fused_bwd)
    # the A/B's recompute side runs the bit-packed kernels: their edits must
    # also invalidate memoized verdicts — including the round-5
    # transposed-layout pair kernels the propagation now rides
    src += inspect.getsource(bitpack._make_fwd_kernel)
    src += inspect.getsource(bitpack._make_bwd_kernel)
    src += inspect.getsource(bitpack._make_t1_kernel)
    src += inspect.getsource(bitpack._make_t2_kernel)
    geom = (
        f"|tr={GATHER_TR}|nj={GATHER_NJ}|align={_ALIGN}"
        f"|t1f={bitpack.T1_FLAT}|t2f={bitpack.T2_FLAT}"
    )
    return hashlib.sha1((src + geom).encode()).hexdigest()[:10]


def _ab_memo_key(n: int, d: int, n_layers: int, batch_size: int) -> str:
    dev = jax.devices()[0].device_kind.replace(" ", "_")
    return f"{_ab_version()}|{dev}|n={n}|d={d}|K={n_layers}|B={batch_size}"


def _ab_memo_load() -> dict:
    try:
        with open(AB_MEMO_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _ab_memo_store(key: str, entry: dict) -> None:
    memo = _ab_memo_load()
    memo[key] = entry
    try:
        os.makedirs(os.path.dirname(AB_MEMO_PATH), exist_ok=True)
        tmp = AB_MEMO_PATH + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(memo, f, indent=1)
        os.replace(tmp, AB_MEMO_PATH)
    except OSError:
        pass  # memo is an optimization only


def ab_cached_verdict(n_users: int, n_items: int, d: int, n_layers: int,
                      batch_size: int):
    """Disk-memoized A/B verdict, or None if never measured. Lets the model
    init skip building a multi-GB cache the measurement already rejected."""
    entry = _ab_memo_load().get(
        _ab_memo_key(n_users + n_items, d, n_layers, batch_size)
    )
    return entry if entry else None


def measure_engines_ms(bip: BipartiteDense, p4, n_layers: int, d: int,
                       batch_size: int) -> dict:
    """Measured ms/step of the part where the engines differ — propagation
    fwd+bwd: the fused cached-operator kernels on R=3·batch rows vs the
    K-layer bit-packed recompute. Everything else in the step (X0, loss,
    Adam) is identical. Timing is scan+readback (utils/timing.py)."""
    from igcn_cf_tpu.kernels.dense_graph import sym_norm_propagate_mean
    from igcn_cf_tpu.utils.timing import scan_ms, smin0

    n = bip.n_users + bip.n_items
    r_tot = 3 * batch_size
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x0 = jax.random.normal(k1, (n, d), jnp.float32)
    rows = jax.random.randint(k2, (r_tot,), 0, n, dtype=jnp.int32)
    ct = jax.random.normal(k3, (r_tot, d), jnp.float32)
    ct_full = jax.random.normal(k4, (n, d), jnp.float32)

    # big arrays travel as scan_ms ARGS, never closures (utils/timing.py)
    def pc_step(s, p4a, rowsa, x0a, cta):
        r = rowsa + smin0(s)
        y, vjpf = jax.vjp(lambda x: cached_prop(p4a, r, x), x0a)
        (dx,) = vjpf(cta)
        return (y[0, 0] + dx[0, 0]) * 1e-20

    def rc_step(s, bipa, x0a, cfa):
        y, vjpf = jax.vjp(
            lambda x: sym_norm_propagate_mean(bipa, x, n_layers),
            x0a + s * 1e-30,
        )
        (dx,) = vjpf(cfa)
        return (y[0, 0] + dx[0, 0]) * 1e-20

    return {
        "pcache_ms": round(scan_ms(pc_step, p4, rows, x0, ct), 3),
        "recompute_ms": round(scan_ms(rc_step, bip, x0, ct_full), 3),
    }


def ab_select(bip: BipartiteDense, p4, n_layers: int, d: int,
              batch_size: int) -> tuple[bool, dict]:
    """Measured engine choice (memoized on disk): True = train through the
    cache. Never ship an unmeasured default — the round-2 pcache regression
    shipped because the gate looked only at capacity."""
    n = bip.n_users + bip.n_items
    key = _ab_memo_key(n, d, n_layers, batch_size)
    entry = _ab_memo_load().get(key)
    if not entry:
        times = measure_engines_ms(bip, p4, n_layers, d, batch_size)
        entry = dict(times, use_pcache=times["pcache_ms"] < times["recompute_ms"])
        _ab_memo_store(key, entry)
    return bool(entry["use_pcache"]), entry


def maybe_build_pcache(bip: BipartiteDense, n_layers: int, d: int,
                       requested="auto", ab_batch: int = 2048):
    """Build the cache for a model whose static gate passed; for 'auto' on
    TPU, confirm with the measured A/B (memoized — a remembered rejection
    skips the multi-GB build entirely). Returns (p4 or None, ab_entry or
    None); None p4 means train on the recompute engine. The returned entry
    itemizes the cold start (VERDICT r4 weak #1 asked where the 13 minutes
    went): ``p_build_s`` (the column-blocked P build incl. its compiles) and
    ``ab_measure_s`` (the engine A/B's compile+measure passes, 0.0 when a
    memoized verdict was reused)."""
    import time

    if requested == "auto" and jax.default_backend() == "tpu":
        verdict = ab_cached_verdict(bip.n_users, bip.n_items, d, n_layers,
                                    ab_batch)
        if verdict is not None and not verdict["use_pcache"]:
            return None, verdict
        t0 = time.time()
        p4 = build_prop_cache(bip, n_layers)
        float(p4[0, 0, 0, 0].astype(jnp.float32))  # sync: build really done
        p_build_s = round(time.time() - t0, 1)
        if verdict is not None:
            return p4, dict(verdict, p_build_s=p_build_s, ab_measure_s=0.0)
        t0 = time.time()
        use, entry = ab_select(bip, p4, n_layers, d, ab_batch)
        entry = dict(entry, p_build_s=p_build_s,
                     ab_measure_s=round(time.time() - t0, 1))
        return (p4 if use else None), entry
    return build_prop_cache(bip, n_layers), None


# -- test oracle -----------------------------------------------------------------


def prop_cache_oracle(train_array: np.ndarray, n_users: int, n_items: int,
                      n_layers: int) -> np.ndarray:
    """Dense NumPy mean_k A^k for tests (exact, f32)."""
    n = n_users + n_items
    a = np.zeros((n, n), np.float64)
    for u, i in np.asarray(train_array):
        a[u, n_users + i] = 1.0
        a[n_users + i, u] = 1.0
    deg = np.maximum(a.sum(1), 1.0)
    s = 1.0 / np.sqrt(deg)
    a = s[:, None] * a * s[None, :]
    p = np.eye(n)
    x = np.eye(n)
    for _ in range(n_layers):
        x = a @ x
        p = p + x
    return (p / (n_layers + 1)).astype(np.float32)
