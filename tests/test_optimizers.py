"""Standalone optimizer suite + distribution/space additions.

Covers the reference inventory rows the round-1 verdict marked partial:
rllab/optimizers/{first_order,lbfgs,penalty_lbfgs,hf}, rllab/distributions/
{categorical,bernoulli,recurrent_*}, rllab/spaces/product.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_from_observation_tpu.rl import distributions as dist
from imitation_from_observation_tpu.rl.optimizers import (
    FirstOrderOptimizer,
    HessianFreeOptimizer,
    LbfgsOptimizer,
    PenaltyLbfgsOptimizer,
)
from imitation_from_observation_tpu.rl.spaces import Box, Discrete, Product


# A strictly convex quadratic: loss(p) = 0.5 (p-t)' A (p-t), minimum at t.
def _quadratic(dim=6, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(dim, dim))
    a = q @ q.T + dim * np.eye(dim)
    t = rng.normal(size=dim)

    def loss(p):
        d = p - t
        return 0.5 * d @ jnp.asarray(a) @ d

    return loss, np.asarray(t, np.float32), a


def test_lbfgs_solves_quadratic():
    loss, t, _ = _quadratic()
    opt = LbfgsOptimizer(lambda p: loss(p), max_opt_itr=40)
    p, info = opt.optimize(jnp.zeros(t.size, jnp.float32), ())
    np.testing.assert_allclose(np.asarray(p), t, atol=1e-3)
    assert info["LossAfter"] < 1e-5


def test_hessian_free_newton_step_is_near_exact():
    # with cg_iters >= dim, one damped Newton step solves a quadratic
    loss, t, _ = _quadratic(dim=5, seed=1)
    opt = HessianFreeOptimizer(lambda p: loss(p), cg_iters=10, reg_coeff=1e-8)
    p, info = opt.optimize(jnp.zeros(t.size, jnp.float32), ())
    np.testing.assert_allclose(np.asarray(p), t, atol=1e-3)
    assert info["LossAfter"] < info["LossBefore"]


def test_hessian_free_rejects_non_improving_step():
    # a loss whose gradient points AWAY from decrease after the Newton step
    # (concave direction): optimizer must keep the original params
    def bad_loss(p):
        return -jnp.sum(p**2) + 1.0

    opt = HessianFreeOptimizer(bad_loss, cg_iters=4, max_backtracks=3)
    p0 = jnp.ones(3, jnp.float32)
    p, info = opt.optimize(p0, ())
    # Newton on a concave quadratic climbs; line search exhausts -> no move
    np.testing.assert_allclose(np.asarray(p), np.asarray(p0))


def test_first_order_linear_regression():
    rng = np.random.default_rng(0)
    w_true = rng.normal(size=4).astype(np.float32)
    x = rng.normal(size=(256, 4)).astype(np.float32)
    y = x @ w_true

    def loss(p, xb, yb):
        return jnp.mean((xb @ p - yb) ** 2)

    opt = FirstOrderOptimizer(loss, learning_rate=0.05, max_epochs=200, batch_size=64)
    p, info = opt.optimize(jnp.zeros(4, jnp.float32), (x, y))
    np.testing.assert_allclose(np.asarray(p), w_true, atol=0.05)
    assert info["LossAfter"] < 1e-3


def test_penalty_lbfgs_respects_constraint():
    # minimize ||p - far||^2 subject to ||p||^2 <= 0.01: the unconstrained
    # minimum badly violates the constraint, so the penalty search must land
    # near the constraint boundary.
    far = jnp.full((3,), 5.0, jnp.float32)

    def losses(p):
        return jnp.sum((p - far) ** 2), jnp.sum(p**2)

    opt = PenaltyLbfgsOptimizer(lambda p: losses(p), max_constraint_val=0.01, inner_steps=50)
    p, info = opt.optimize(jnp.zeros(3, jnp.float32), ())
    assert info["ConstraintAfter"] <= 0.011
    # and it still made progress toward `far` vs. the start
    assert info["LossAfter"] < info["LossBefore"]


def test_ppo_still_learns_with_shared_optimizer():
    # PPO now delegates to PenaltyLbfgsOptimizer; one smoke update
    from imitation_from_observation_tpu.rl import PPO, GaussianMLPPolicy

    policy = GaussianMLPPolicy(4, 2, hidden=(8, 8), seed=0)
    algo = PPO(policy)
    rng = np.random.default_rng(0)
    n = 64
    obs = rng.normal(size=(n, 4)).astype(np.float32)
    actions = rng.normal(size=(n, 2)).astype(np.float32)
    info = policy.dist_info(policy.params, jnp.asarray(obs))
    samples = dict(
        observations=obs,
        actions=actions,
        advantages=rng.normal(size=n).astype(np.float32),
        agent_infos={"mean": np.asarray(info["mean"]), "log_std": np.asarray(info["log_std"])},
    )
    out = algo.optimize(samples)
    assert np.isfinite(out["LossAfter"]) and out["MeanKL"] <= 0.02
    flat = jax.flatten_util.ravel_pytree(policy.params)[0]
    assert np.all(np.isfinite(np.asarray(flat)))


# -- distributions -------------------------------------------------------------


def test_categorical_matches_manual():
    old = {"prob": jnp.asarray([[0.2, 0.8], [0.5, 0.5]])}
    new = {"prob": jnp.asarray([[0.4, 0.6], [0.9, 0.1]])}
    a = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(dist.categorical_likelihood_ratio(a, old, new)),
        [0.6 / 0.8, 0.9 / 0.5],
        rtol=1e-5,
    )
    kl_manual = (
        0.2 * np.log(0.2 / 0.4) + 0.8 * np.log(0.8 / 0.6),
        0.5 * np.log(0.5 / 0.9) + 0.5 * np.log(0.5 / 0.1),
    )
    np.testing.assert_allclose(np.asarray(dist.categorical_kl(old, new)), kl_manual, rtol=1e-4)
    ent = -(0.2 * np.log(0.2) + 0.8 * np.log(0.8))
    np.testing.assert_allclose(np.asarray(dist.categorical_entropy(old))[0], ent, rtol=1e-4)


def test_bernoulli_matches_manual():
    old = {"p": jnp.asarray([[0.3, 0.7]])}
    new = {"p": jnp.asarray([[0.6, 0.2]])}
    a = jnp.asarray([[1.0, 0.0]])
    ll = np.log(0.6) + np.log(0.8)
    np.testing.assert_allclose(
        np.asarray(dist.bernoulli_log_likelihood(a, new))[0], ll, rtol=1e-5
    )
    lr = (0.6 / 0.3) * (0.8 / 0.3)
    np.testing.assert_allclose(
        np.asarray(dist.bernoulli_likelihood_ratio(a, old, new))[0], lr, rtol=1e-4
    )
    kl = 0.3 * np.log(0.3 / 0.6) + 0.7 * np.log(0.7 / 0.4) + 0.7 * np.log(0.7 / 0.2) + 0.3 * np.log(
        0.3 / 0.8
    )
    np.testing.assert_allclose(np.asarray(dist.bernoulli_kl(old, new))[0], kl, rtol=1e-4)


def test_recurrent_shapes_reduce_last_axis_only():
    # the reference's Recurrent* distributions are the same math over
    # [N, T, dim]; ours broadcast over leading axes by construction
    n, t, d = 3, 5, 2
    rng = np.random.default_rng(0)
    info = {
        "mean": jnp.asarray(rng.normal(size=(n, t, d)), jnp.float32),
        "log_std": jnp.asarray(rng.normal(size=(n, t, d)) * 0.1, jnp.float32),
    }
    a = jnp.asarray(rng.normal(size=(n, t, d)), jnp.float32)
    assert dist.log_likelihood(a, info).shape == (n, t)
    assert dist.kl(info, info).shape == (n, t)
    np.testing.assert_allclose(np.asarray(dist.kl(info, info)), 0.0, atol=1e-6)
    prob = jax.nn.softmax(jnp.asarray(rng.normal(size=(n, t, 4)), jnp.float32))
    onehot = jax.nn.one_hot(jnp.argmax(prob, -1), 4)
    assert dist.categorical_kl({"prob": prob}, {"prob": prob}).shape == (n, t)
    assert dist.categorical_log_likelihood(onehot, {"prob": prob}).shape == (n, t)


# -- Product space --------------------------------------------------------------


def test_product_space_roundtrip(rng):
    box = Box(-np.ones(3), np.ones(3))
    disc = Discrete(4)
    prod = Product(box, disc)
    assert prod.flat_dim == 7
    x = (np.asarray([0.1, -0.2, 0.3], np.float32), 2)
    flat = prod.flatten(x)
    assert flat.shape == (7,)
    back = prod.unflatten(flat)
    np.testing.assert_allclose(back[0], x[0])
    assert back[1] == 2
    assert prod.contains(x)
    assert not prod.contains((np.full(3, 9.0, np.float32), 2))
    s = prod.sample(rng)
    assert prod.contains(s)
    flat_n = prod.flatten_n([x, s])
    assert flat_n.shape == (2, 7)
    assert prod.unflatten_n(flat_n)[1][1] == s[1]
