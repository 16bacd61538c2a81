"""PRNG handling: one seed in, deterministic named streams out.

The reference seeds python/numpy/torch globally (test.py:207-213,
pretraining/train.py:66-74). JAX is functional: we thread explicit keys.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class PRNGSeq:
    """A stateful convenience wrapper producing fresh subkeys.

    >>> keys = PRNGSeq(42)
    >>> k1 = keys()          # fresh subkey
    >>> k2 = keys("dropout") # named fold for reproducible per-site streams
    """

    def __init__(self, seed: int | jax.Array):
        self._key = jax.random.PRNGKey(seed) if isinstance(seed, int) else seed
        self._count = 0

    def __call__(self, name: str | None = None) -> jax.Array:
        if name is not None:
            return jax.random.fold_in(self._key, _stable_hash(name))
        self._count += 1
        return jax.random.fold_in(self._key, self._count)


def _stable_hash(name: str) -> int:
    h = 2166136261
    for ch in name.encode():
        h = ((h ^ ch) * 16777619) & 0x7FFFFFFF
    return h


def uniform_like(key: jax.Array, x: jax.Array) -> jax.Array:
    return jax.random.uniform(key, x.shape, dtype=jnp.float32)
