"""Observation/action spaces, gathered in one import point.

Reference ``rllab/spaces/``: Box (box.py), Discrete (discrete.py), Product
(product.py). Box and Discrete live next to their main consumers
(sim/base.py, rl/policies_extra.py); :class:`Product` composes any mix of
them with the reference's flatten-as-concatenation contract
(product.py: ``flat_dim = sum(components)``, ``flatten`` concatenates each
component's flattening, ``unflatten`` splits at the component boundaries).
"""

from __future__ import annotations

import numpy as np

from imitation_from_observation_tpu.rl.policies_extra import Discrete
from imitation_from_observation_tpu.sim.base import Box

__all__ = ["Box", "Discrete", "Product"]


class Product:
    """Cartesian product of component spaces (rllab/spaces/product.py)."""

    def __init__(self, *components):
        if len(components) == 1 and isinstance(components[0], (list, tuple)):
            components = tuple(components[0])
        self.components = tuple(components)

    @property
    def flat_dim(self) -> int:
        return int(sum(c.flat_dim for c in self.components))

    def sample(self, rng: np.random.Generator):
        return tuple(c.sample(rng) for c in self.components)

    def contains(self, x) -> bool:
        return len(x) == len(self.components) and all(
            c.contains(xi) for c, xi in zip(self.components, x)
        )

    def flatten(self, x) -> np.ndarray:
        return np.concatenate([c.flatten(xi) for c, xi in zip(self.components, x)])

    def unflatten(self, x):
        out, i = [], 0
        for c in self.components:
            out.append(c.unflatten(np.asarray(x)[i : i + c.flat_dim]))
            i += c.flat_dim
        return tuple(out)

    def flatten_n(self, xs) -> np.ndarray:
        return np.stack([self.flatten(x) for x in xs])

    def unflatten_n(self, xs):
        return [self.unflatten(x) for x in xs]
