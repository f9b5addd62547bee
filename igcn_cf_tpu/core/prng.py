"""Deterministic randomness plumbing.

The reference seeds python/numpy/torch/cuda and forces deterministic cuDNN
(reference utils.py:12-20). In JAX, determinism is by construction: we thread
explicit PRNG keys. ``set_seed`` additionally seeds the host-side numpy/python
RNGs used by data preprocessing and host samplers so whole runs reproduce.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def set_seed(seed: int = 0) -> jax.Array:
    """Seed host RNGs and return a root JAX PRNG key (reference utils.py:12-20)."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class KeySeq:
    """A stateful convenience wrapper handing out fresh subkeys on the host side.

    Used only outside jit (epoch loops); inside jitted steps keys are split
    functionally.
    """

    def __init__(self, key_or_seed):
        if isinstance(key_or_seed, int):
            key_or_seed = jax.random.PRNGKey(key_or_seed)
        self._key = key_or_seed

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def next_n(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs
