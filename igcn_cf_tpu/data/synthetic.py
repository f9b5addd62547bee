"""Synthetic interaction datasets for tests and benchmarks.

The reference ships no data (datasets are downloaded separately, reference
README.md). Tests and the bench need deterministic data with the right
statistical shape, so we synthesize power-law bipartite interaction graphs:
item popularity ~ Zipf, per-user degree ~ clipped lognormal — matching the
salient properties (power-law degrees, ~25 avg interactions/user) of
Gowalla/Yelp/Amazon-book.
"""

from __future__ import annotations

import numpy as np

from igcn_cf_tpu.data.dataset import Interactions


def synthetic_interactions(
    n_users: int = 500,
    n_items: int = 600,
    avg_degree: float = 20.0,
    seed: int = 0,
    zipf_a: float = 1.1,
    name: str = "synthetic",
    split_ratio=(0.7, 0.1, 0.2),
) -> Interactions:
    rng = np.random.default_rng(seed)
    # learnable structure: latent user/item factors + Zipf popularity bias.
    # A pure-popularity generator would make Popularity the Bayes-optimal
    # recommender; the latent term gives personalized models headroom.
    dim = 8
    u_fac = rng.normal(size=(n_users, dim)) / np.sqrt(dim)
    i_fac = rng.normal(size=(n_items, dim))
    pop = 1.0 / np.power(np.arange(1, n_items + 1), zipf_a)
    rng.shuffle(pop)
    pop_bias = np.log(pop / pop.sum())

    degrees = np.clip(
        rng.lognormal(mean=np.log(avg_degree), sigma=0.6, size=n_users), 3, n_items // 2
    ).astype(np.int64)

    train, val, test = [], [], []
    for u in range(n_users):
        k = int(min(degrees[u], n_items))
        # Gumbel top-k == sampling without replacement from the softmax of
        # (taste + 0.5 * popularity)
        logits = 2.0 * (u_fac[u] @ i_fac.T) + 0.5 * pop_bias
        gumbel = rng.gumbel(size=n_items)
        items = np.argsort(logits + gumbel)[-k:][::-1].tolist()
        n = len(items)
        n_train = max(1, int(n * split_ratio[0]))
        n_test = int(n * split_ratio[2])
        train.append(items[:n_train])
        val.append(items[n_train : n - n_test] if n_test else [])
        test.append(items[n - n_test :] if n_test else [])
    ds = Interactions(name, n_users, n_items, train, val, test)
    return ds
