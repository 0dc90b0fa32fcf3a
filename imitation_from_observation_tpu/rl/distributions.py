"""Policy distributions (pure functions over dist-info dicts).

- Diagonal Gaussian over ``{"mean", "log_std"}`` — math matches reference
  ``rllab/distributions/diagonal_gaussian.py:6-90``: KL with the stds in
  numerator form, likelihood ratio via exp of log-density difference,
  entropy with the (log(2*pi*e))/2 constant.
- Categorical over ``{"prob"}`` (one-hot actions) — matches
  ``rllab/distributions/categorical.py``.
- Bernoulli over ``{"p"}`` (per-dim binary actions) — matches
  ``rllab/distributions/bernoulli.py``.

Recurrent variants: the reference's ``Recurrent{DiagonalGaussian,
Categorical}`` (rllab/distributions/recurrent_*.py) apply the same math over
``[N, T, dim]`` tensors. Every function here reduces only over ``axis=-1``,
so they already operate element-wise over any leading (batch, time) axes —
combine with a valids mask for padded sequences (see rl/trpo.py's recurrent
surrogate).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# plain-python constant: a jnp computation here would initialize a backend at
# import time, making every CLI (even pure plotting) fail when no device is
# reachable (observed: relay-outage import crashes in the study scripts)
LOG_2PI = math.log(2.0 * math.pi)


def log_likelihood(actions, dist_info):
    mean, log_std = dist_info["mean"], dist_info["log_std"]
    zs = (actions - mean) / jnp.exp(log_std)
    return (
        -jnp.sum(log_std, axis=-1)
        - 0.5 * jnp.sum(jnp.square(zs), axis=-1)
        - 0.5 * actions.shape[-1] * LOG_2PI
    )


def likelihood_ratio(actions, old_dist_info, new_dist_info):
    return jnp.exp(log_likelihood(actions, new_dist_info) - log_likelihood(actions, old_dist_info))


def kl(old_dist_info, new_dist_info):
    old_mean, old_log_std = old_dist_info["mean"], old_dist_info["log_std"]
    new_mean, new_log_std = new_dist_info["mean"], new_dist_info["log_std"]
    old_std, new_std = jnp.exp(old_log_std), jnp.exp(new_log_std)
    numerator = jnp.square(old_mean - new_mean) + jnp.square(old_std) - jnp.square(new_std)
    denominator = 2.0 * jnp.square(new_std) + 1e-8
    return jnp.sum(numerator / denominator + new_log_std - old_log_std, axis=-1)


def entropy(dist_info):
    log_std = dist_info["log_std"]
    return jnp.sum(log_std + 0.5 * (LOG_2PI + 1.0), axis=-1)


# -- Categorical (actions one-hot over the last axis) -------------------------

EPS = 1e-8


def categorical_log_likelihood(actions_onehot, dist_info):
    return jnp.log(jnp.sum(dist_info["prob"] * actions_onehot, axis=-1) + EPS)


def categorical_likelihood_ratio(actions_onehot, old_dist_info, new_dist_info):
    new = jnp.sum(new_dist_info["prob"] * actions_onehot, axis=-1)
    old = jnp.sum(old_dist_info["prob"] * actions_onehot, axis=-1)
    return (new + EPS) / (old + EPS)


def categorical_kl(old_dist_info, new_dist_info):
    old, new = old_dist_info["prob"], new_dist_info["prob"]
    return jnp.sum(old * (jnp.log(old + EPS) - jnp.log(new + EPS)), axis=-1)


def categorical_entropy(dist_info):
    p = dist_info["prob"]
    return -jnp.sum(p * jnp.log(p + EPS), axis=-1)


# -- Bernoulli (independent binary actions, info {"p"}) ------------------------


def bernoulli_log_likelihood(actions, dist_info):
    p = dist_info["p"]
    return jnp.sum(
        actions * jnp.log(p + EPS) + (1.0 - actions) * jnp.log(1.0 - p + EPS), axis=-1
    )


def bernoulli_likelihood_ratio(actions, old_dist_info, new_dist_info):
    old_p, new_p = old_dist_info["p"], new_dist_info["p"]
    num = actions * new_p + (1.0 - actions) * (1.0 - new_p)
    den = actions * old_p + (1.0 - actions) * (1.0 - old_p)
    return jnp.prod((num + EPS) / (den + EPS), axis=-1)


def bernoulli_kl(old_dist_info, new_dist_info):
    old_p, new_p = old_dist_info["p"], new_dist_info["p"]
    return jnp.sum(
        old_p * (jnp.log(old_p + EPS) - jnp.log(new_p + EPS))
        + (1.0 - old_p) * (jnp.log(1.0 - old_p + EPS) - jnp.log(1.0 - new_p + EPS)),
        axis=-1,
    )


def bernoulli_entropy(dist_info):
    p = dist_info["p"]
    return -jnp.sum(p * jnp.log(p + EPS) + (1.0 - p) * jnp.log(1.0 - p + EPS), axis=-1)
