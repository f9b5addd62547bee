"""Microbench: round-5 transposed-layout pair kernels (kernels/bitpack.py
``bbt_pair[_dropped]``) vs the round-2 per-direction kernels, at the Gowalla
flagship shape (30208 x 45056 packed bits, d=64).

What is being tested (VERDICT r4 next #2): the old kernels put d on the MXU
lane axis — at d=64 half the 128 result lanes idle; feat aggregation (4 such
passes per train step) was 52% of the step. The t-kernels contract over the
tile instead (N = 512-row / 4096-col tile axis, full lanes at any d), as one
flat big-K dot per tile (T?_FLAT=True) or 32 per-plane dots (False).

Run ON THE REAL TPU (serialize with other TPU jobs):
    python tools/microbench_dual.py [d]

Prints ms per pass for: old fwd/bwd (masked+un), t1/t2 flat and loop
(masked+un), and the in-situ feat_aggregate fwd / fwd+bwd on both paths.

Measured findings live in KERNEL_FINDINGS.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from igcn_cf_tpu.kernels import bitpack as bp
from igcn_cf_tpu.utils.timing import scan_ms

M, K = 30208, 45056  # Gowalla padded shape
P_DROP = 0.3


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    assert jax.default_backend() == "tpu", "run on the real TPU"
    rng = np.random.default_rng(0)
    kp = K // 32
    wp = jnp.asarray(
        rng.integers(0, 2**32, size=(M, kp), dtype=np.uint64).astype(np.uint32)
    )
    x = jnp.asarray(rng.normal(size=(K, d)).astype(np.float32))
    xu = jnp.asarray(rng.normal(size=(M, d)).astype(np.float32))
    x1t = jnp.asarray(np.ascontiguousarray(np.asarray(x).T))
    x2t = jnp.asarray(np.ascontiguousarray(np.asarray(xu).T))
    seed = jnp.uint32(123)

    def t(name, fn, *args):
        try:
            # two independent measurements with long loops: the tunnel's
            # per-readback jitter showed ~3x swings on single short loops
            ms1 = scan_ms(fn, *args, lo=8, hi=40)
            ms2 = scan_ms(fn, *args, lo=8, hi=40)
            ms = min(ms1, ms2)
            print(f"{name:34s} {ms:7.3f} ms   (reps {ms1:.3f}/{ms2:.3f})")
            return ms
        except Exception as e:  # Mosaic verification failures etc.
            print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            return None

    # -- old per-direction kernels (baseline) --------------------------------
    def old_fwd(s, wp, x, masked):
        y = bp._dispatch(wp, x + s * 1e-30, seed, P_DROP, masked, False)
        return y[0, 0] * 1e-20

    def old_bwd(s, wp, xu, masked):
        y = bp._dispatch(wp, xu + s * 1e-30, seed, P_DROP, masked, True)
        return y[0, 0] * 1e-20

    for masked in (False, True):
        tag = "masked" if masked else "unmask"
        t(f"old fwd  B@X    {tag}", lambda s, a, b: old_fwd(s, a, b, masked),
          wp, x)
        t(f"old bwd  B^T@X  {tag}", lambda s, a, b: old_bwd(s, a, b, masked),
          wp, xu)

    # -- t-kernels: variant sweep (unmasked — the premask path's dots) --------
    def t1(s, wp, x1t):
        y = bp._t1_pallas(wp, x1t + s * 1e-30, seed, 0.0, False)
        return y[0, 0] * 1e-20

    def t2(s, wp, x2t):
        y = bp._t2_pallas(wp, x2t + s * 1e-30, seed, 0.0, False)
        return y[0, 0] * 1e-20

    for t1_flat in (False, True):
        bp.T1_FLAT = t1_flat
        t(f"t1 (d,m) {'flat' if t1_flat else 'loop'} unmask", t1, wp, x1t)
    for t2_mode in ("flat", "loopcat", False):
        bp.T2_FLAT = t2_mode
        t(f"t2 (d,K) {t2_mode or 'loop'} unmask", t2, wp, x2t)
    bp.T1_FLAT = False
    bp.T2_FLAT = "flat"

    def mask_step(s, wp):
        k = jax.random.fold_in(jax.random.PRNGKey(1), s.astype(jnp.int32))
        w = bp.mask_words(wp, k, P_DROP)
        return w[0, 0].astype(jnp.float32) * 1e-20

    t("mask_words hash (one seed)", mask_step, wp)

    def mask_hw_step(s, wp):
        k = jax.random.fold_in(jax.random.PRNGKey(1), s.astype(jnp.int32))
        w = bp.mask_words_hw(wp, k, P_DROP)
        return w[0, 0].astype(jnp.float32) * 1e-20

    t("mask_words hw-rng (one seed)", mask_hw_step, wp)

    # drop-rate sanity of the hw path (not a timing)
    try:
        w = bp.mask_words_hw(wp, jax.random.PRNGKey(3), P_DROP)
        kept = float(jnp.sum(jax.lax.population_count(w))) / float(
            jnp.sum(jax.lax.population_count(wp))
        )
        print(f"hw-rng keep rate: {kept:.4f} (want ~{1-P_DROP:.4f})")
    except Exception as e:
        print(f"hw-rng keep rate check FAILED: {type(e).__name__}: {e}")

    # -- in-situ: feat_aggregate old path vs pair path ------------------------
    from igcn_cf_tpu.kernels.dense_graph import BipartiteDense, feat_aggregate

    n_users, n_items = 29858, 40981
    nnz = 833000
    arr = np.stack(
        [rng.integers(0, n_users, nnz), rng.integers(0, n_items, nnz)], axis=1
    )
    g = BipartiteDense.build(arr, n_users, n_items)
    e_i = jnp.asarray(rng.normal(size=(n_items, d)).astype(np.float32))
    e_u = jnp.asarray(rng.normal(size=(n_users, d)).astype(np.float32))
    tok_u = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    tok_i = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    w_u = jnp.asarray(rng.random(n_users).astype(np.float32))
    w_i = jnp.asarray(rng.random(n_items).astype(np.float32))
    key = jax.random.PRNGKey(5)

    def feat_old(g, e_i, e_u, tok_u, tok_i, w_u, w_i, dropout, key):
        """The pre-round-5 feat_aggregate body (per-direction kernels),
        reproduced inline for the A/B."""
        if dropout > 0.0 and key is not None:
            k_b, k_bt, k_tu, k_ti = jax.random.split(key, 4)
            scale = 1.0 / (1.0 - dropout)
            tku = jax.random.bernoulli(k_tu, 1.0 - dropout, (g.n_users, 1))
            tki = jax.random.bernoulli(k_ti, 1.0 - dropout, (g.n_items, 1))
            xu = (g.mm_ui_dropped(e_i, k_b, dropout)
                  + jnp.where(tku, tok_u[None, :], 0.0)) * scale
            xi = (g.mm_iu_dropped(e_u, k_bt, dropout)
                  + jnp.where(tki, tok_i[None, :], 0.0)) * scale
        else:
            xu = g.mm_ui(e_i) + tok_u[None, :]
            xi = g.mm_iu(e_u) + tok_i[None, :]
        return jnp.concatenate([w_u[:, None] * xu, w_i[:, None] * xi], axis=0)

    def feat_dropped(g, e_i, e_u, tok_u, tok_i, w_u, w_i, dropout, key):
        """The in-kernel-masked pair variant (hash re-run in all 4 passes)."""
        from igcn_cf_tpu.kernels.dense_graph import _pad_rows

        x1t = _pad_rows(e_i, g.cols_padded).T
        x2t = _pad_rows(e_u, g.rows_padded).T
        k_b, k_bt, k_tu, k_ti = jax.random.split(key, 4)
        scale = 1.0 / (1.0 - dropout)
        tku = jax.random.bernoulli(k_tu, 1.0 - dropout, (g.n_users, 1))
        tki = jax.random.bernoulli(k_ti, 1.0 - dropout, (g.n_items, 1))
        y1t, y2t = bp.bbt_pair_dropped(g.B, x1t, x2t, k_b, k_bt, dropout)
        xu_t = (y1t[:, : g.n_users]
                + jnp.where(tku.T, tok_u[:, None], 0.0)) * scale
        xi_t = (y2t[:, : g.n_items]
                + jnp.where(tki.T, tok_i[:, None], 0.0)) * scale
        return jnp.concatenate(
            [w_u[None, :] * xu_t, w_i[None, :] * xi_t], axis=1
        ).T

    from igcn_cf_tpu.utils.timing import smin0

    for name, fn in (("old-path", feat_old), ("bbt-drop", feat_dropped),
                     ("premask ", feat_aggregate)):
        # fold the loop carry into the dropout KEY: the real trainer draws a
        # fresh key every step, so mask computation must NOT be
        # loop-invariant-hoisted out of the timing loop (it was: the first
        # premask numbers excluded the whole mask_words cost)
        def fwd_step(s, g, e_i, e_u, tu, ti, wu, wi, fn=fn):
            k = jax.random.fold_in(key, smin0(s))
            out = fn(g, e_i + s * 1e-30, e_u, tu, ti, wu, wi,
                     dropout=P_DROP, key=k)
            return out[0, 0] * 1e-20

        def fwdbwd_step(s, g, e_i, e_u, tu, ti, wu, wi, fn=fn):
            k = jax.random.fold_in(key, smin0(s))

            def loss(e_i, e_u):
                out = fn(g, e_i, e_u, tu, ti, wu, wi,
                         dropout=P_DROP, key=k)
                return jnp.sum(out * 1e-20)

            l, grads = jax.value_and_grad(loss, argnums=(0, 1))(
                e_i + s * 1e-30, e_u
            )
            return l + grads[0][0, 0] + grads[1][0, 0]

        t(f"feat_agg fwd drop   {name}", fwd_step,
          g, e_i, e_u, tok_u, tok_i, w_u, w_i)
        t(f"feat_agg fwd+bwd dr {name}", fwdbwd_step,
          g, e_i, e_u, tok_u, tok_i, w_u, w_i)


if __name__ == "__main__":
    main()
