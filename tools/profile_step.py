"""Break down the IGCN train step cost on TPU with scan-based timing.

All device state travels through scan carries / jit args — closure capture
would embed GBs of constants into the remote-compile request."""

from __future__ import annotations

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from igcn_cf_tpu.data.sampler import DeviceNegativeSampler
from igcn_cf_tpu.models.base import get_model

N_STEPS = 50
BATCH = 2048


def scan_time(step_fn, state, n=3):
    """step_fn(state, key) -> (state, scalar); state passed as jit arg."""

    @jax.jit
    def run(state, keys):
        state, outs = jax.lax.scan(step_fn, state, keys)
        return jnp.sum(outs)

    keys = jax.random.split(jax.random.PRNGKey(0), N_STEPS)
    _ = float(run(state, keys))  # compile + sync
    t0 = time.time()
    for _ in range(n):
        out = run(state, keys)
    _ = float(out)
    return (time.time() - t0) / n / N_STEPS * 1e3


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, ".bench_dataset.pkl"), "rb") as f:
        ds = pickle.load(f)
    model = get_model({"name": "IGCN", "embedding_size": 64, "n_layers": 3,
                       "dropout": 0.3, "feature_ratio": 1.0}, ds)
    print("backend:", model.backend)
    params = model.init_params(jax.random.PRNGKey(0))
    buffers = model.init_buffers()
    sampler = DeviceNegativeSampler.build(ds).with_dense_b(buffers["bip"].B)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    import json

    prof_path = os.path.join(root, "PROFILE_STEP.json")
    try:
        with open(prof_path) as f:
            out = json.load(f)
    except (OSError, ValueError):
        out = {}
    # pieces selectable via argv so each TPU invocation stays under the
    # remote-compile timeout; results merge into PROFILE_STEP.json
    wanted = [a for a in sys.argv[1:] if not a.startswith("-")]

    def want(name):
        return not wanted or name in wanted

    def rec(name, ms):
        out[name] = round(ms, 2)
        print(f"{name:22s} {ms:7.2f} ms", flush=True)
        with open(prof_path, "w") as f:
            json.dump(out, f, indent=1)

    def s_step(state, key):
        (sampler,) = state
        u, p_, n_ = sampler.sample(key, BATCH)
        return (sampler,), jnp.sum(u) + jnp.sum(p_) + jnp.sum(n_)

    if want("sampler_only"):
        rec("sampler_only", scan_time(s_step, (sampler,)))

    def agg_step(state, key):
        params, buffers = state
        x0 = model.inductive_rep_layer(params, buffers, train=True, key=key)
        return state, x0[0, 0]

    if want("feat_agg_fwd_drop"):
        rec("feat_agg_fwd_drop", scan_time(agg_step, (params, buffers)))

    def aggg_step(state, key):
        params, buffers = state
        g = jax.grad(
            lambda p: jnp.sum(
                model.inductive_rep_layer(p, buffers, train=True, key=key)
                ** 2
            )
        )(params)
        return state, g["embedding"][0, 0]

    if want("feat_agg_fwd_bwd_drop"):
        rec("feat_agg_fwd_bwd_drop", scan_time(aggg_step, (params, buffers)))

    def agg2_step(state, key):
        params, buffers = state
        x0 = model.inductive_rep_layer(params, buffers, train=False, key=None)
        return state, x0[0, 0] + jax.random.uniform(key)

    if want("feat_agg_fwd_eval"):
        rec("feat_agg_fwd_eval", scan_time(agg2_step, (params, buffers)))

    if model.pcache:
        from igcn_cf_tpu.kernels.pcache import cached_prop

        def pc_step(state, key):
            params, buffers = state
            rows = jax.random.randint(
                key, (3 * BATCH,), 0, model.n_users + model.n_items,
                dtype=jnp.int32,
            )
            x0 = jnp.ones(
                (model.n_users + model.n_items, 64), jnp.float32
            ) * jax.random.uniform(key)
            y, vjpf = jax.vjp(lambda x: cached_prop(buffers["pcache"], rows, x), x0)
            (dx,) = vjpf(y)
            return state, y[0, 0] + dx[0, 0]

        if want("pcache_fwd_bwd"):
            rec("pcache_fwd_bwd", scan_time(pc_step, (params, buffers)))

    if "--full" not in sys.argv:
        rep_skip = True  # rep_recompute pieces cost two extra long compiles
    else:
        rep_skip = False

    def rep_step(state, key):
        params, buffers = state
        rep = model.rep(params, buffers, train=True, key=key)
        return state, rep[0, 0]

    if not rep_skip and want("rep_recompute_fwd_drop"):
        rec("rep_recompute_fwd_drop", scan_time(rep_step, (params, buffers)))

    def repg_step(state, key):
        params, buffers = state
        g = jax.grad(
            lambda p: jnp.sum(model.rep(p, buffers, train=True, key=key) ** 2)
        )(params)
        return state, g["embedding"][0, 0]

    if not rep_skip and want("rep_recompute_fwd_bwd"):
        rec("rep_recompute_fwd_bwd", scan_time(repg_step, (params, buffers)))

    def loss_only(state, key):
        params, buffers = state
        k2 = key
        users = jax.random.randint(k2, (BATCH,), 0, model.n_users, jnp.int32)
        pos = jax.random.randint(k2, (BATCH,), 0, model.n_items, jnp.int32)
        neg = jax.random.randint(k2, (BATCH,), 0, model.n_items, jnp.int32)

        def loss_fn(params):
            ur, pr, nr, l2 = model.bpr_pieces(
                params, buffers, users, pos, neg, train=True, key=k2
            )
            bpr = jnp.mean(jax.nn.softplus(jnp.sum(ur * nr, 1) - jnp.sum(ur * pr, 1)))
            aps, ans = model.aux_scores(params, users, pos, neg)
            return bpr + 0.01 * jnp.mean(jax.nn.softplus(ans - aps))

        loss, g = jax.value_and_grad(loss_fn)(params)
        return state, loss + g["embedding"][0, 0]

    if want("loss_fwd_bwd_fixed_batch"):
        rec("loss_fwd_bwd_fixed_batch",
            scan_time(loss_only, (params, buffers)))

    def adam_step(state, key):
        params, opt_state = state
        g = jax.tree_util.tree_map(
            lambda x: x * jax.random.uniform(key), params
        )
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), params["embedding"][0, 0]

    if want("adam_only"):
        rec("adam_only", scan_time(adam_step, (params, opt_state)))

    def full_step(state, key):
        params, opt_state, buffers, sampler = state
        k1, k2, k3 = jax.random.split(key, 3)

        def loss_fn(params):
            u, p_, negs = sampler.sample(k1, BATCH)
            ur, pr, nr, l2 = model.bpr_pieces(
                params, buffers, u, p_, negs[:, 0], train=True, key=k2
            )
            bpr = jnp.mean(jax.nn.softplus(jnp.sum(ur * nr, 1) - jnp.sum(ur * pr, 1)))
            au, ap, an = sampler.sample(k3, BATCH)
            aps, ans = model.aux_scores(params, au, ap, an[:, 0])
            return bpr + 0.01 * jnp.mean(jax.nn.softplus(ans - aps))

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, buffers, sampler), loss

    if want("full_step"):
        rec("full_step",
            scan_time(full_step, (params, opt_state, buffers, sampler)))

    out["engine"] = "pcache" if model.pcache else model.backend
    out["batch"] = BATCH
    if all(x in out for x in
           ("full_step", "feat_agg_fwd_bwd_drop", "sampler_only")):
        residual = out["full_step"] - (
            out.get("pcache_fwd_bwd", 0.0)
            + out["feat_agg_fwd_bwd_drop"]
            + out["sampler_only"]
        )
        out["loss_adam_gather_residual"] = round(residual, 2)
    with open(prof_path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote PROFILE_STEP.json", flush=True)


if __name__ == "__main__":
    main()
