"""Diagonal Gaussian policy distribution (pure functions over
``{"mean", "log_std"}`` dicts).

Math matches reference ``rllab/distributions/diagonal_gaussian.py:6-90``:
KL with the stds in numerator form, likelihood ratio via exp of log-density
difference, entropy with the (log(2*pi*e))/2 constant.
"""

from __future__ import annotations

import jax.numpy as jnp

LOG_2PI = jnp.log(2.0 * jnp.pi)


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
