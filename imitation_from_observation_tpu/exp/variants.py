"""Cartesian-product experiment variant generation.

Capability match for the reference ``VariantGenerator``
(rllab/misc/instrument.py): declare axes with ``add``, optionally dependent
on earlier axes via a callable; ``variants()`` yields every combination as a
dict (the launchers' hyperparameter sweeps, e.g. run_trpo_push.py's
``for scale in [0.1, 1.0, 10.0]`` x seeds grid).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable


class VariantGenerator:
    def __init__(self):
        self._axes: list[tuple[str, Any]] = []

    def add(self, key: str, values: Iterable | Callable) -> "VariantGenerator":
        self._axes.append((key, values))
        return self

    def variants(self) -> list[dict[str, Any]]:
        out: list[dict[str, Any]] = [{}]
        for key, values in self._axes:
            nxt = []
            for partial in out:
                vals = values(partial) if callable(values) else values
                for v in vals:
                    d = dict(partial)
                    d[key] = v
                    nxt.append(d)
            out = nxt
        return out

    def __len__(self) -> int:
        return len(self.variants())
