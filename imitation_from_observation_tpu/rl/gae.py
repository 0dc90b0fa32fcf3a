"""Advantage estimation (GAE) and sample processing.

Matches the reference pipeline (rllab/sampler/base.py:260-395 non-recurrent
branch): per path, ``delta = r + discount*V' - V``, advantages =
``discount_cumsum(delta, discount*lambda)``, returns =
``discount_cumsum(r, discount)``; then concatenation across paths, optional
advantage centering/positive shift (rllab/algos/util.py), baseline refit on
returns, and the tabular diagnostics including the ReturnTrue family
(base.py:372-393).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def discount_cumsum(x: np.ndarray, discount: float) -> np.ndarray:
    """y[t] = sum_{k>=t} discount^(k-t) x[k] (reference misc/special.py:107)."""
    y = np.zeros_like(x, dtype=np.float64)
    acc = 0.0
    for t in range(len(x) - 1, -1, -1):
        acc = x[t] + discount * acc
        y[t] = acc
    return y


def explained_variance_1d(ypred: np.ndarray, y: np.ndarray) -> float:
    vary = np.var(y)
    if np.isclose(vary, 0):
        return 0.0 if np.var(ypred) > 0 else 1.0
    return 1 - np.var(y - ypred) / (vary + 1e-8)


def process_paths(
    paths: list[dict[str, Any]],
    baseline,
    discount: float = 0.99,
    gae_lambda: float = 1.0,
    center_adv: bool = True,
    positive_adv: bool = False,
    success_threshold: float | None = -0.5,
) -> dict[str, Any]:
    baselines, returns = [], []
    all_path_baselines = [baseline.predict(p) for p in paths]
    for idx, path in enumerate(paths):
        path_baselines = np.append(all_path_baselines[idx], 0)
        deltas = path["rewards"] + discount * path_baselines[1:] - path_baselines[:-1]
        path["advantages"] = discount_cumsum(deltas, discount * gae_lambda)
        path["returns"] = discount_cumsum(path["rewards"], discount)
        baselines.append(path_baselines[:-1])
        returns.append(path["returns"])

    ev = explained_variance_1d(np.concatenate(baselines), np.concatenate(returns))

    observations = np.concatenate([p["observations"] for p in paths])
    actions = np.concatenate([p["actions"] for p in paths])
    rewards = np.concatenate([p["rewards"] for p in paths])
    rets = np.concatenate([p["returns"] for p in paths])
    advantages = np.concatenate([p["advantages"] for p in paths])
    agent_infos = {
        k: np.concatenate([p["agent_infos"][k] for p in paths])
        for k in paths[0]["agent_infos"]
    }

    if center_adv:
        advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
    if positive_adv:
        advantages = advantages - advantages.min() + 1e-8

    undiscounted_returns = [float(np.sum(p["rewards"])) for p in paths]
    samples = dict(
        observations=observations,
        actions=actions,
        rewards=rewards,
        returns=rets,
        advantages=advantages,
        agent_infos=agent_infos,
        paths=paths,
    )
    diagnostics = dict(
        AverageDiscountedReturn=float(np.mean([p["returns"][0] for p in paths])),
        AverageReturn=float(np.mean(undiscounted_returns)),
        ExplainedVariance=float(ev),
        NumTrajs=len(paths),
        StdReturn=float(np.std(undiscounted_returns)),
        MaxReturn=float(np.max(undiscounted_returns)),
        MinReturn=float(np.min(undiscounted_returns)),
    )
    if "reward_true" in paths[0].get("env_infos", {}):
        trues = [float(np.sum(p["env_infos"]["reward_true"])) for p in paths]
        diagnostics.update(
            ReturnTrue=float(np.mean(trues)),
            MinTrue=float(np.min(trues)),
            MaxTrue=float(np.max(trues)),
            ArgmaxTrueReturn=trues[int(np.argmax(undiscounted_returns))],
        )
        if success_threshold is not None:
            # the reference's paper-facing Success Rate (notebooks/plots.ipynb
            # cell 25: success iff ReturnTrue > thresh; -0.5 default, -0.55
            # for sweep) computed per rollout instead of per seed
            diagnostics["SuccessRate"] = float(
                np.mean([t > success_threshold for t in trues])
            )

    baseline.fit(paths)
    return samples | {"diagnostics": diagnostics}


def pad_paths_recurrent(paths: list[dict[str, Any]], center_adv: bool = True) -> dict[str, Any]:
    """Recurrent-policy sample layout (reference base.py:289-343): pad every
    path to the max length into [B, T, ...] arrays plus a ``valids`` mask;
    advantages are centered globally before padding."""
    T = max(len(p["rewards"]) for p in paths)

    def pad(x, t=T):
        w = [(0, t - len(x))] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), w)

    adv_cat = np.concatenate([p["advantages"] for p in paths])
    mean, std = adv_cat.mean(), adv_cat.std() + 1e-8
    advantages = np.stack(
        [pad((p["advantages"] - mean) / std if center_adv else p["advantages"]) for p in paths]
    )
    return dict(
        observations=np.stack([pad(p["observations"]) for p in paths]),
        actions=np.stack([pad(p["actions"]) for p in paths]),
        advantages=advantages,
        valids=np.stack([pad(np.ones_like(p["rewards"])) for p in paths]),
        agent_infos={
            k: np.stack([pad(p["agent_infos"][k]) for p in paths])
            for k in paths[0]["agent_infos"]
        },
    )
