"""Value baselines.

``LinearFeatureBaseline`` matches reference
``rllab/baselines/linear_feature_baseline.py:19-44`` exactly: features
``[clip(obs,±10), obs^2, t/100, (t/100)^2, (t/100)^3, 1]``, ridge regression
solved from the normal equations with a NaN-retry loop escalating the
regularizer 10x (the reference's NaN robustness pattern, SURVEY §5).
"""

from __future__ import annotations

import numpy as np


class ZeroBaseline:
    def fit(self, paths) -> None:
        pass

    def predict(self, path) -> np.ndarray:
        return np.zeros(len(path["rewards"]))


class LinearFeatureBaseline:
    def __init__(self, reg_coeff: float = 1e-5):
        self._coeffs: np.ndarray | None = None
        self._reg_coeff = reg_coeff

    def _features(self, path) -> np.ndarray:
        o = np.clip(path["observations"], -10, 10)
        l = len(path["rewards"])
        al = np.arange(l).reshape(-1, 1) / 100.0
        return np.concatenate([o, o**2, al, al**2, al**3, np.ones((l, 1))], axis=1)

    def fit(self, paths) -> None:
        featmat = np.concatenate([self._features(p) for p in paths])
        returns = np.concatenate([p["returns"] for p in paths])
        reg = self._reg_coeff
        for _ in range(5):
            self._coeffs = np.linalg.lstsq(
                featmat.T @ featmat + reg * np.identity(featmat.shape[1]),
                featmat.T @ returns,
                rcond=None,
            )[0]
            if not np.any(np.isnan(self._coeffs)):
                break
            reg *= 10

    def predict(self, path) -> np.ndarray:
        if self._coeffs is None:
            return np.zeros(len(path["rewards"]))
        return self._features(path) @ self._coeffs
