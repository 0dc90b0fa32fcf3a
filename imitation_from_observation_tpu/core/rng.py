"""PRNG threading utilities.

The reference mixes three RNGs (python ``random``, ``np.random`` globals, and
per-env ``np_random``; seeding at ``rllab/misc/ext.py:set_seed``). Here all
device-side randomness flows through explicit ``jax.random`` keys and all
host-side randomness through ``np.random.Generator`` objects derived from one
root seed, so every run is reproducible end to end.
"""

from __future__ import annotations

import jax
import numpy as np


class RngStream:
    """A splittable key stream: ``stream.next()`` never reuses a key.

    The key is pinned to the host CPU backend by default: stream consumers
    (rollout sampling) call ``next()`` every env step, and on a remote-TPU
    default backend each ``jax.random.split`` would otherwise be a full
    network round trip. Pass ``host=False`` to keep keys on the default
    device."""

    def __init__(self, seed_or_key, host: bool = True):
        if isinstance(seed_or_key, int):
            key = jax.random.key(seed_or_key)
        else:
            key = seed_or_key
        if host and jax.default_backend() != "cpu":
            try:
                key = jax.device_put(key, jax.local_devices(backend="cpu")[0])
            except RuntimeError:
                pass
        self._key = key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int) -> jax.Array:
        self._key, *subs = jax.random.split(self._key, n + 1)
        return jax.numpy.stack(subs)

    def fork(self) -> "RngStream":
        return RngStream(self.next())


def host_rng(seed: int, stream: str = "") -> np.random.Generator:
    """Derive an independent numpy Generator for host-side sampling."""
    ss = np.random.SeedSequence(seed, spawn_key=tuple(stream.encode()))
    return np.random.Generator(np.random.PCG64(ss))
