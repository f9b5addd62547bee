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

    def s_step(state, key):
        (sampler,) = state
        u, p_, n_ = sampler.sample(key, BATCH)
        return (sampler,), jnp.sum(u) + jnp.sum(p_) + jnp.sum(n_)

    print(f"sampler only:          {scan_time(s_step, (sampler,)):7.2f} ms")

    def agg_step(state, key):
        params, buffers = state
        x0 = model.inductive_rep_layer(params, buffers, train=True, key=key)
        return state, x0[0, 0]

    print(f"feat agg fwd (drop):   {scan_time(agg_step, (params, buffers)):7.2f} ms")

    def agg2_step(state, key):
        params, buffers = state
        x0 = model.inductive_rep_layer(params, buffers, train=False, key=None)
        return state, x0[0, 0] + jax.random.uniform(key)

    print(f"feat agg fwd (eval):   {scan_time(agg2_step, (params, buffers)):7.2f} ms")

    def rep_step(state, key):
        params, buffers = state
        rep = model.rep(params, buffers, train=True, key=key)
        return state, rep[0, 0]

    print(f"rep fwd (drop):        {scan_time(rep_step, (params, buffers)):7.2f} ms")

    def repg_step(state, key):
        params, buffers = state
        g = jax.grad(
            lambda p: jnp.sum(model.rep(p, buffers, train=True, key=key) ** 2)
        )(params)
        return state, g["embedding"][0, 0]

    print(f"rep fwd+bwd (drop):    {scan_time(repg_step, (params, buffers)):7.2f} ms")

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

    print(
        f"full step:             {scan_time(full_step, (params, opt_state, buffers, sampler)):7.2f} ms"
    )


if __name__ == "__main__":
    main()
