"""PRNG key threading helpers.

The reference relies on torch's global RNG (torch.manual_seed in
examples/ackley.py:63). Here randomness is explicit: the functional core takes
keys, and the thin object shell (Sober / priors) holds a `KeyRing` that splits
off fresh keys on demand.
"""
from __future__ import annotations

import jax


class KeyRing:
    """A stateful splitter over a jax PRNG key for the object-level API.

    The functional core never uses this class: every jitted function takes an
    explicit key. KeyRing only lives at the orchestration (host) level.
    """

    def __init__(self, seed_or_key=0):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs
