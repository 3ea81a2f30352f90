"""PRNG-key discipline.

All device-side randomness flows from one root `jax.random.key` split into
named streams; host-side sampling (dataset splits, negative sampling,
retrieval-sample selection) uses `numpy.random.Generator` / stdlib `random`
seeded to reproduce the reference's documented seeds (split seed 42 at
reference `data_preparation.py:91`, retrieval-sample seed 11 at
reference `inference.py:101`).
"""

from __future__ import annotations

from typing import Dict, Iterator

import jax


class RngStream:
    """A fold-in based stream of PRNG keys.

    Deterministic: the key for (name, step) never depends on call order.
    """

    def __init__(self, seed: int | jax.Array):
        self._root = jax.random.key(seed) if isinstance(seed, int) else seed
        self._names: Dict[str, int] = {}

    def _name_id(self, name: str) -> int:
        if name not in self._names:
            # Stable hash independent of Python's randomized str hash.
            h = 2166136261
            for ch in name.encode():
                h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
            self._names[name] = h
        return self._names[name]

    def key(self, name: str, step: int = 0) -> jax.Array:
        k = jax.random.fold_in(self._root, self._name_id(name))
        return jax.random.fold_in(k, step)

    def keys(self, name: str, start: int = 0) -> Iterator[jax.Array]:
        step = start
        while True:
            yield self.key(name, step)
            step += 1
