"""PRNG discipline.

All stochastic ops in the framework take an explicit `jax.random.key` and
split deterministically — no global RNG state (the reference leans on TF's
global graph seeds; here reproducibility is a function of the root seed
alone).
"""

import jax


class KeySequence:
    """A host-side stateful splitter for code that needs a stream of keys
    (the epoch/batch driver loops). Inside jitted code, split explicitly."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def next_n(self, n: int):
        keys = jax.random.split(self._key, n + 1)
        self._key = keys[0]
        return keys[1:]
