"""RL stack tests: distribution math, GAE, baseline, TRPO/VPG learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_from_observation_tpu.core.config import RLConfig
from imitation_from_observation_tpu.rl import (
    BatchPolopt,
    GaussianMLPPolicy,
    LinearFeatureBaseline,
    TRPO,
    VPG,
    discount_cumsum,
    process_paths,
)
from imitation_from_observation_tpu.rl import distributions as dg
from imitation_from_observation_tpu.rl.sampler import VectorizedSampler, truncate_paths
from imitation_from_observation_tpu.sim.base import Box


class PointEnv:
    """2-D point mass: action = velocity, reward = -|pos| (the rllab example
    env pattern) — dense reward for fast algorithm tests."""

    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)
        self.action_space = Box(-np.ones(2) * 0.25, np.ones(2) * 0.25)
        self.observation_space = Box(-np.full(2, np.inf), np.full(2, np.inf))

    def seed(self, s):
        self.rng = np.random.default_rng(s)

    def reset(self):
        self.pos = self.rng.uniform(-1, 1, 2)
        return self.pos.astype(np.float32)

    def step(self, a):
        self.pos = self.pos + np.clip(a, -0.25, 0.25)
        reward = -float(np.linalg.norm(self.pos))
        return self.pos.astype(np.float32), reward, False, {}


class _VecPoint:
    def __init__(self, n, seed=0, max_path=20):
        self.envs = [PointEnv(seed + i) for i in range(n)]
        self.n_envs = n
        self.action_space = self.envs[0].action_space
        self.observation_space = self.envs[0].observation_space
        self._t = np.zeros(n, int)
        self.max_path = max_path
        # the sampler validates the vec env enforces the SAME limit it was
        # configured with (sampler.py) — expose it like the real vec envs
        self.max_path_length = max_path

    def reset(self):
        self._t[:] = 0
        return np.stack([e.reset() for e in self.envs])

    def step(self, actions):
        obs, rs, ds, infos = [], [], [], []
        for i, (e, a) in enumerate(zip(self.envs, actions)):
            o, r, d, inf = e.step(a)
            self._t[i] += 1
            if self._t[i] >= self.max_path:
                d, self._t[i] = True, 0
                o = e.reset()
            obs.append(o); rs.append(r); ds.append(d); infos.append(inf)
        return np.stack(obs), np.asarray(rs), np.asarray(ds), infos


def test_discount_cumsum():
    x = np.array([1.0, 2.0, 3.0])
    got = discount_cumsum(x, 0.5)
    np.testing.assert_allclose(got, [1 + 2 * 0.5 + 3 * 0.25, 2 + 3 * 0.5, 3.0])


def test_diagonal_gaussian_math():
    info = {"mean": jnp.zeros((4, 2)), "log_std": jnp.zeros((4, 2))}
    np.testing.assert_allclose(np.asarray(dg.kl(info, info)), 0, atol=1e-6)
    # logli of mean action under unit gaussian = -0.5*d*log(2pi)
    ll = dg.log_likelihood(jnp.zeros((4, 2)), info)
    np.testing.assert_allclose(np.asarray(ll), -np.log(2 * np.pi), rtol=1e-6)
    # entropy of unit gaussian = d/2 * log(2 pi e)
    ent = dg.entropy(info)
    np.testing.assert_allclose(np.asarray(ent), np.log(2 * np.pi * np.e), rtol=1e-6)
    # KL(N(0,1) || N(1,1)) = 0.5 per dim
    info2 = {"mean": jnp.ones((4, 2)), "log_std": jnp.zeros((4, 2))}
    np.testing.assert_allclose(np.asarray(dg.kl(info, info2)), 1.0, rtol=1e-5)


def test_policy_sampling_and_std():
    pol = GaussianMLPPolicy(obs_dim=3, action_dim=2, init_std=10.0, seed=0)
    obs = np.zeros((256, 3), np.float32)
    actions, infos = pol.get_actions(obs, jax.random.key(0))
    assert actions.shape == (256, 2)
    np.testing.assert_allclose(np.exp(infos["log_std"][0]), 10.0, rtol=1e-5)
    assert 7.0 < actions.std() < 13.0  # matches init_std


def test_linear_feature_baseline_exact_fit(rng):
    # value that IS linear in the features must be recovered exactly
    paths = []
    w = rng.standard_normal(8)
    for _ in range(5):
        obs = rng.standard_normal((20, 1)).astype(np.float32)
        al = np.arange(20).reshape(-1, 1) / 100.0
        feats = np.concatenate([np.clip(obs, -10, 10), obs**2, al, al**2, al**3, np.ones((20, 1))], 1)
        # pad feature vector to match w
        returns = feats @ w[:6]
        paths.append(dict(observations=obs, rewards=np.zeros(20), returns=returns))
    bl = LinearFeatureBaseline()
    bl.fit(paths)
    pred = bl.predict(paths[0])
    np.testing.assert_allclose(pred, paths[0]["returns"], atol=2e-3)


def test_process_paths_diagnostics():
    paths = [
        dict(
            observations=np.zeros((5, 2), np.float32),
            actions=np.zeros((5, 2), np.float32),
            rewards=np.ones(5),
            env_infos={"reward_true": np.array([0, 0, 0, 0, 0.5])},
            agent_infos={"mean": np.zeros((5, 2)), "log_std": np.zeros((5, 2))},
        )
        for _ in range(3)
    ]
    samples = process_paths(paths, LinearFeatureBaseline(), discount=0.9)
    assert samples["observations"].shape == (15, 2)
    d = samples["diagnostics"]
    np.testing.assert_allclose(d["AverageReturn"], 5.0)
    np.testing.assert_allclose(d["ReturnTrue"], 0.5)
    # all three paths end at ReturnTrue 0.5 > -0.5 threshold -> success
    np.testing.assert_allclose(d["SuccessRate"], 1.0)
    # centered advantages
    np.testing.assert_allclose(samples["advantages"].mean(), 0, atol=1e-6)


def test_success_rate_threshold():
    def path(rt):
        return dict(
            observations=np.zeros((3, 2), np.float32),
            actions=np.zeros((3, 2), np.float32),
            rewards=np.zeros(3),
            env_infos={"reward_true": np.array([0, 0, rt])},
            agent_infos={"mean": np.zeros((3, 2)), "log_std": np.zeros((3, 2))},
        )

    # per-rollout success iff ReturnTrue > threshold (plots.ipynb cell 25)
    samples = process_paths(
        [path(-0.2), path(-0.6), path(-0.4), path(-0.9)],
        LinearFeatureBaseline(),
        success_threshold=-0.5,
    )
    np.testing.assert_allclose(samples["diagnostics"]["SuccessRate"], 0.5)
    samples = process_paths(
        [path(-0.52), path(-0.6)], LinearFeatureBaseline(), success_threshold=-0.55
    )
    np.testing.assert_allclose(samples["diagnostics"]["SuccessRate"], 0.5)


def test_best_iterate_snapshot(tmp_path):
    """BatchPolopt keeps a `best` snapshot of the PRE-update params at the
    argmax-ReturnTrue iteration."""
    import jax.numpy as jnp

    from imitation_from_observation_tpu.core.checkpoint import checkpoint_meta, load_pytree

    class _TrueRewardVec(_VecPoint):
        def step(self, actions):
            obs, rewards, dones, infos = super().step(actions)
            for i, info in enumerate(infos):
                info["reward_true"] = rewards[i]
            return obs, rewards, dones, infos

    vec = _TrueRewardVec(5, seed=0, max_path=10)
    pol = GaussianMLPPolicy(obs_dim=2, action_dim=2, hidden=(8,), init_std=1.0, seed=0)
    cfg = RLConfig(batch_size=100, max_path_length=10, n_iters=4, snapshot_mode="none")
    algo = BatchPolopt(
        vec, pol, LinearFeatureBaseline(), TRPO(pol, step_size=0.05), cfg,
        log_dir=str(tmp_path),
    )
    history = algo.train()
    assert algo.best is not None
    best_rows = [h for h in history if h["Iteration"] == algo.best["itr"]]
    assert best_rows and best_rows[0]["ReturnTrue"] == algo.best["ReturnTrue"]
    assert algo.best["ReturnTrue"] == max(h["ReturnTrue"] for h in history)
    assert history[-1]["BestReturnTrue"] == algo.best["ReturnTrue"]
    meta = checkpoint_meta(algo.best["path"])
    assert meta["meta"]["itr"] == algo.best["itr"]
    restored = load_pytree(algo.best["path"], pol.params)
    assert all(
        jnp.asarray(a).shape == jnp.asarray(b).shape
        for a, b in zip(
            jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(pol.params)
        )
    )


def test_truncate_paths():
    paths = [
        dict(rewards=np.arange(10), observations=np.zeros((10, 2)), env_infos={"a": np.arange(10)})
        for _ in range(3)
    ]
    out = truncate_paths(paths, 15)
    assert sum(len(p["rewards"]) for p in out) == 15
    assert len(out[1]["env_infos"]["a"]) == 5


def _train(algo_cls, n_iters, **kw):
    import tempfile

    vec = _VecPoint(10, seed=0)
    pol = GaussianMLPPolicy(obs_dim=2, action_dim=2, hidden=(16,), init_std=1.0, seed=0)
    opt = algo_cls(pol, **kw)
    cfg = RLConfig(batch_size=400, max_path_length=20, n_iters=n_iters, discount=0.99, snapshot_mode="none")
    algo = BatchPolopt(vec, pol, LinearFeatureBaseline(), opt, cfg, log_dir=tempfile.mkdtemp())
    return algo.train()


def test_trpo_learns_point_env(tmp_path):
    history = _train(TRPO, 10, step_size=0.05)
    first, last = history[0]["AverageReturn"], history[-1]["AverageReturn"]
    assert last > first + 1.0, (first, last)
    # KL constraint respected on accepted steps
    assert all(h["MeanKL"] <= 0.05 + 1e-3 or h["dLoss"] == 0 for h in history)
    # no NaNs anywhere (reference test_algos.py's no-NaN contract)
    flat = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(history)])


def test_vpg_learns_point_env():
    history = _train(VPG, 15, learning_rate=5e-2)
    assert history[-1]["AverageReturn"] > history[0]["AverageReturn"] + 0.5


def test_trpo_rejects_bad_steps():
    """With an absurdly tight KL bound every step must be rejected or tiny."""
    pol = GaussianMLPPolicy(obs_dim=2, action_dim=2, hidden=(8,), seed=0)
    opt = TRPO(pol, step_size=1e-12, max_backtracks=2)
    rng = np.random.default_rng(0)
    before = np.asarray(pol.params["log_std"])
    samples = dict(
        observations=rng.standard_normal((50, 2)).astype(np.float32),
        actions=rng.standard_normal((50, 2)).astype(np.float32),
        advantages=rng.standard_normal(50).astype(np.float32),
        agent_infos=dict(
            mean=np.zeros((50, 2), np.float32), log_std=np.zeros((50, 2), np.float32)
        ),
    )
    diag = opt.optimize(samples)
    after = np.asarray(pol.params["log_std"])
    if diag["dLoss"] == 0.0:  # step rejected -> params unchanged
        np.testing.assert_allclose(before, after)


def test_categorical_policy():
    from imitation_from_observation_tpu.rl.policies_extra import CategoricalMLPPolicy, Discrete

    sp = Discrete(4)
    assert sp.flat_dim == 4 and sp.contains(2)
    np.testing.assert_array_equal(sp.flatten(1), [0, 1, 0, 0])
    pol = CategoricalMLPPolicy(obs_dim=3, n_actions=4, hidden=(8,), seed=0)
    acts, info = pol.get_actions(np.zeros((64, 3), np.float32), jax.random.key(0))
    assert acts.shape == (64,) and set(np.unique(acts)) <= {0, 1, 2, 3}
    np.testing.assert_allclose(info["prob"].sum(axis=1), 1.0, rtol=1e-5)


def test_gru_policy_recurrent_state():
    from imitation_from_observation_tpu.rl.policies_extra import GaussianGRUPolicy

    pol = GaussianGRUPolicy(obs_dim=3, action_dim=2, hidden=8, seed=0)
    pol.reset(4)
    obs = np.random.default_rng(0).standard_normal((4, 3)).astype(np.float32)
    _, i1 = pol.get_actions(obs, jax.random.key(0))
    _, i2 = pol.get_actions(obs, jax.random.key(0))  # carry advanced
    assert not np.allclose(i1["mean"], i2["mean"])  # state-dependent
    # sequence API for the recurrent surrogate
    seq = np.random.default_rng(1).standard_normal((2, 5, 3)).astype(np.float32)
    info = pol.dist_info_sequence(pol.params, jnp.asarray(seq))
    assert info["mean"].shape == (2, 5, 2)


def test_conv_policy():
    from imitation_from_observation_tpu.rl.policies_extra import GaussianConvPolicy

    pol = GaussianConvPolicy((16, 16, 3), action_dim=3, seed=0)
    obs = np.random.default_rng(0).random((5, 16, 16, 3)).astype(np.float32)
    acts, info = pol.get_actions(obs, jax.random.key(0))
    assert acts.shape == (5, 3)


def test_gaussian_mlp_baseline_fits():
    from imitation_from_observation_tpu.rl.nn_baseline import GaussianMLPBaseline

    rng = np.random.default_rng(0)
    paths = []
    for _ in range(8):
        obs = rng.standard_normal((20, 2)).astype(np.float32)
        returns = obs[:, 0] * 2 + 1
        paths.append(dict(observations=obs, rewards=np.zeros(20), returns=returns))
    bl = GaussianMLPBaseline(obs_dim=2, hidden=(16,), epochs=200, learning_rate=1e-2)
    bl.fit(paths)
    pred = bl.predict(paths[0])
    corr = np.corrcoef(pred, paths[0]["returns"])[0, 1]
    assert corr > 0.9, corr


def test_recurrent_trpo_gru():
    """Recurrent TRPO: padded [B,T] batches + valids mask, GRU dist over
    sequences (reference npo.py recurrent branch)."""
    from imitation_from_observation_tpu.rl.gae import pad_paths_recurrent
    from imitation_from_observation_tpu.rl.policies_extra import GaussianGRUPolicy
    from imitation_from_observation_tpu.rl.sampler import rollout
    from imitation_from_observation_tpu.core.rng import RngStream

    pol = GaussianGRUPolicy(obs_dim=2, action_dim=2, hidden=8, seed=0)
    rng = RngStream(0)
    paths = []
    for i in range(6):
        pol.reset(1)
        env = PointEnv(seed=i)
        p = rollout(env, pol, max_path_length=8 + (i % 3), rng=rng)  # ragged lengths
        p["returns"] = discount_cumsum(p["rewards"], 0.99)
        p["advantages"] = p["rewards"] - p["rewards"].mean()
        paths.append(p)
    samples = pad_paths_recurrent(paths)
    assert samples["observations"].shape[:2] == (6, 10)
    assert samples["valids"].sum() == sum(len(p["rewards"]) for p in paths)
    opt = TRPO(pol, step_size=0.05)
    diag = opt.optimize(samples)
    assert np.isfinite(diag["MeanKL"]) and diag["MeanKL"] <= 0.05 + 1e-3 or diag["dLoss"] == 0


def test_trpo_mesh_sharded_matches_single_device():
    """Data-parallel TRPO over the 8-device mesh produces the same update as
    the single-device path (padding rows are valids-masked, so the batch
    need not divide the device count)."""
    from imitation_from_observation_tpu.parallel import make_mesh
    from jax.flatten_util import ravel_pytree

    rng = np.random.default_rng(5)
    N, obs_dim, act_dim = 43, 3, 2
    samples = dict(
        observations=rng.standard_normal((N, obs_dim)).astype(np.float32),
        actions=rng.standard_normal((N, act_dim)).astype(np.float32),
        advantages=rng.standard_normal(N).astype(np.float32),
        agent_infos=dict(
            mean=rng.standard_normal((N, act_dim)).astype(np.float32),
            log_std=np.zeros((N, act_dim), np.float32),
        ),
    )
    flats = []
    for mesh in (None, make_mesh(8)):
        pol = GaussianMLPPolicy(obs_dim, act_dim, hidden=(8,), init_std=1.0, seed=0)
        TRPO(pol, mesh=mesh).optimize(dict(samples))
        flats.append(np.asarray(ravel_pytree(pol.params)[0]))
    np.testing.assert_allclose(flats[0], flats[1], rtol=2e-4, atol=2e-5)


def test_trpo_fd_hvp_matches_perlmutter():
    """Finite-difference HVP gives the same descent direction family: one
    update from identical samples moves params similarly."""
    rng = np.random.default_rng(0)
    samples = dict(
        observations=rng.standard_normal((200, 2)).astype(np.float32),
        actions=rng.standard_normal((200, 2)).astype(np.float32),
        advantages=rng.standard_normal(200).astype(np.float32),
        agent_infos=dict(
            mean=np.zeros((200, 2), np.float32), log_std=np.zeros((200, 2), np.float32)
        ),
    )
    outs = {}
    for mode in ["perlmutter", "fd"]:
        pol = GaussianMLPPolicy(obs_dim=2, action_dim=2, hidden=(8,), seed=0)
        opt = TRPO(pol, step_size=0.01, hvp_mode=mode)
        opt.optimize(dict(samples))
        from jax.flatten_util import ravel_pytree

        outs[mode], _ = ravel_pytree(pol.params)
    a, b = (np.asarray(outs[m]) for m in ["perlmutter", "fd"])
    assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
    np.testing.assert_allclose(a, b, rtol=0.2, atol=5e-3)  # same direction, fd noise


def test_lstm_policy_recurrent_trpo():
    """GaussianLSTMPolicy through the recurrent TRPO path (reference
    sandbox/rocky/tf/policies/gaussian_lstm_policy.py + npo recurrent
    branch): runs, improves, keeps finite params."""
    from imitation_from_observation_tpu.rl.policies_extra import GaussianLSTMPolicy

    vec = _VecPoint(8, seed=0, max_path=12)
    pol = GaussianLSTMPolicy(obs_dim=2, action_dim=2, hidden=8, init_std=1.0, seed=0)
    import tempfile

    cfg = RLConfig(batch_size=240, max_path_length=12, n_iters=6, snapshot_mode="none")
    algo = BatchPolopt(
        vec, pol, LinearFeatureBaseline(), TRPO(pol, step_size=0.1), cfg,
        log_dir=tempfile.mkdtemp(),
    )
    h = algo.train()
    assert np.isfinite(h[-1]["AverageReturn"])
    assert h[-1]["AverageReturn"] > h[0]["AverageReturn"] - 0.5  # not diverging
    flat = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(pol.params)])
    assert np.all(np.isfinite(flat))


def test_lstm_policy_reset_where():
    from imitation_from_observation_tpu.rl.policies_extra import GaussianLSTMPolicy

    pol = GaussianLSTMPolicy(obs_dim=3, action_dim=2, hidden=4, seed=0)
    import jax as _jax

    obs = np.random.default_rng(0).standard_normal((5, 3)).astype(np.float32)
    pol.get_actions(obs, _jax.random.key(0))
    pol.get_actions(obs, _jax.random.key(1))
    c_before = np.asarray(pol._carry[0]).copy()
    assert np.abs(c_before).sum() > 0
    pol.reset_where(np.array([True, False, True, False, False]))
    c_after = np.asarray(pol._carry[0])
    assert np.all(c_after[[0, 2]] == 0)
    np.testing.assert_array_equal(c_after[[1, 3, 4]], c_before[[1, 3, 4]])


def test_categorical_recurrent_policies():
    """Categorical GRU/LSTM policies (reference categorical_{gru,lstm}_
    policy.py): one-hot actions, prob infos, sequence dist infos sum to 1."""
    import jax as _jax

    from imitation_from_observation_tpu.rl.policies_extra import (
        CategoricalGRUPolicy,
        CategoricalLSTMPolicy,
    )

    for cls in (CategoricalGRUPolicy, CategoricalLSTMPolicy):
        pol = cls(obs_dim=3, n_actions=4, hidden=8, seed=0)
        obs = np.random.default_rng(1).standard_normal((6, 3)).astype(np.float32)
        a, info = pol.get_actions(obs, _jax.random.key(0))
        assert a.shape == (6, 4) and np.all(a.sum(1) == 1)
        np.testing.assert_allclose(info["prob"].sum(1), 1.0, rtol=1e-5)
        pol.reset_where(np.array([True] * 6))
        seq = pol.dist_info_sequence(pol.params, np.zeros((2, 5, 3), np.float32))
        assert seq["prob"].shape == (2, 5, 4)
        np.testing.assert_allclose(np.asarray(seq["prob"]).sum(-1), 1.0, rtol=1e-5)
        a0, info0 = pol.get_action(obs[0], _jax.random.key(2))
        assert isinstance(a0, int) and 0 <= a0 < 4


def test_regressor_suite():
    """The four regressors (reference sandbox/rocky/tf/regressors/): each
    fits its family's synthetic target."""
    from imitation_from_observation_tpu.rl.regressors import (
        BernoulliMLPRegressor,
        CategoricalMLPRegressor,
        DeterministicMLPRegressor,
        GaussianMLPRegressor,
    )

    rng = np.random.default_rng(0)
    xs = rng.standard_normal((256, 3)).astype(np.float32)

    ys = np.stack([xs[:, 0] + 0.5 * xs[:, 1], xs[:, 2] ** 2], 1)
    for cls in (DeterministicMLPRegressor, GaussianMLPRegressor):
        reg = cls(3, 2, hidden=(32,), n_steps=500, learning_rate=1e-2)
        reg.fit(xs, ys)
        pred = reg.predict(xs)
        assert np.mean((pred - ys) ** 2) < 0.05, cls.__name__

    labels = (xs[:, 0] > 0).astype(int)
    onehot = np.eye(2, dtype=np.float32)[labels]
    creg = CategoricalMLPRegressor(3, 2, hidden=(16,), n_steps=500)
    creg.fit(xs, onehot)
    assert (creg.predict(xs).argmax(1) == labels).mean() > 0.95
    ll = creg.predict_log_likelihood(xs, onehot)
    assert ll.shape == (256,) and ll.mean() > -0.5

    binary = (xs[:, :2] > 0).astype(np.float32)
    breg = BernoulliMLPRegressor(3, 2, hidden=(16,), n_steps=500)
    breg.fit(xs, binary)
    assert ((breg.predict(xs) == binary).mean()) > 0.95

    # gaussian log-likelihood sane on its own fit
    greg = GaussianMLPRegressor(3, 2, hidden=(32,), n_steps=500)
    greg.fit(xs, ys)
    assert np.isfinite(greg.predict_log_likelihood(xs, ys)).all()


def test_gru_policy_reset_where():
    from imitation_from_observation_tpu.rl.policies_extra import GaussianGRUPolicy

    pol = GaussianGRUPolicy(obs_dim=2, action_dim=2, hidden=4, seed=0)
    pol.reset(3)
    obs = np.ones((3, 2), np.float32)
    pol.get_actions(obs, jax.random.key(0))
    carry_before = np.asarray(pol._carry)
    pol.reset_where(np.array([True, False, True]))
    carry_after = np.asarray(pol._carry)
    np.testing.assert_allclose(carry_after[0], 0)
    np.testing.assert_allclose(carry_after[2], 0)
    np.testing.assert_allclose(carry_after[1], carry_before[1])


def test_sampler_masked_recurrent_reset_mid_batch():
    """When one env auto-resets mid-batch, ONLY its GRU state is zeroed —
    surviving envs' hidden state is untouched (reference vec_env_executor
    per-env reset semantics, sandbox/rocky/tf/envs/vec_env_executor.py:8-47)."""
    from imitation_from_observation_tpu.rl.policies_extra import GaussianGRUPolicy
    from imitation_from_observation_tpu.rl.sampler import VectorizedSampler

    class StaggeredVec:
        """2 fake envs; env 0 dones every 2 steps, env 1 every 4."""

        n_envs = 2

        def __init__(self):
            self.t = 0
            self.carry_log = []

        def reset(self):
            self.t = 0
            return np.zeros((2, 3), np.float32)

        def step(self, actions):
            self.t += 1
            dones = np.array([self.t % 2 == 0, self.t % 4 == 0])
            obs = np.full((2, 3), self.t, np.float32)
            return obs, np.zeros(2), dones, [dict(), dict()]

    pol = GaussianGRUPolicy(obs_dim=3, action_dim=2, hidden=4, seed=0)
    vec = StaggeredVec()
    sampler = VectorizedSampler(vec, pol, batch_size=6, max_path_length=4)

    carries = []
    orig_reset_where = pol.reset_where

    def spying_reset_where(dones):
        carries.append((np.asarray(pol._carry).copy(), np.asarray(dones).copy()))
        orig_reset_where(dones)
        carries[-1] = carries[-1] + (np.asarray(pol._carry).copy(),)

    pol.reset_where = spying_reset_where
    sampler.obtain_samples()
    assert carries, "mid-batch resets never happened"
    for before, dones, after in carries:
        for i, d in enumerate(dones):
            if d:
                np.testing.assert_allclose(after[i], 0)
            else:
                np.testing.assert_allclose(after[i], before[i])  # untouched
    # at least one event had a survivor with live (nonzero) state
    assert any(
        (not d) and np.abs(before[i]).max() > 0
        for before, dones, _ in carries
        for i, d in enumerate(dones)
    )


def test_trpo_categorical_mlp_optimize():
    """TRPO trains categorical policies (reference trpo + categorical_mlp_
    policy, rllab/algos/trpo.py + categorical distribution): integer
    actions one-hot inside the jitted update, probs move toward the
    positive-advantage action."""
    from imitation_from_observation_tpu.rl.policies_extra import CategoricalMLPPolicy
    from imitation_from_observation_tpu.rl.trpo import TRPO

    rng = np.random.default_rng(0)
    pol = CategoricalMLPPolicy(obs_dim=3, n_actions=4, hidden=(8,), seed=0)
    algo = TRPO(pol, step_size=0.05)
    obs = rng.standard_normal((256, 3)).astype(np.float32)

    def p_action0():
        return float(np.mean(np.asarray(pol.dist_info(pol.params, jnp.asarray(obs))["prob"])[:, 0]))

    before = p_action0()
    for it in range(4):
        acts, info = pol.get_actions(obs, jax.random.key(it))
        adv = np.where(acts == 0, 1.0, -1.0).astype(np.float32)  # prefer action 0
        diag = algo.optimize(
            dict(observations=obs, actions=acts, advantages=adv, agent_infos=info)
        )
        assert np.isfinite(diag["LossAfter"]) and np.isfinite(diag["MeanKL"])
    assert p_action0() > before + 0.05


def test_trpo_categorical_recurrent_optimize():
    """TRPO's recurrent path accepts categorical GRU policies: padded
    [B, T] one-hot actions with a valids mask, prob infos."""
    from imitation_from_observation_tpu.rl.policies_extra import CategoricalGRUPolicy
    from imitation_from_observation_tpu.rl.trpo import TRPO

    rng = np.random.default_rng(0)
    B, T, K = 8, 5, 3
    pol = CategoricalGRUPolicy(obs_dim=2, n_actions=K, hidden=8, seed=0)
    algo = TRPO(pol, step_size=0.05)
    obs = rng.standard_normal((B, T, 2)).astype(np.float32)
    valids = np.ones((B, T), np.float32)
    valids[:, -1] = 0.0  # padded tail

    def p_action0():
        p = np.asarray(pol.dist_info_sequence(pol.params, jnp.asarray(obs))["prob"])
        return float((p[..., 0] * valids).sum() / valids.sum())

    before = p_action0()
    for it in range(4):
        info = {"prob": np.asarray(pol.dist_info_sequence(pol.params, jnp.asarray(obs))["prob"])}
        acts_idx = rng.integers(0, K, (B, T))
        acts = np.eye(K, dtype=np.float32)[acts_idx]
        adv = np.where(acts_idx == 0, 1.0, -1.0).astype(np.float32)
        diag = algo.optimize(
            dict(observations=obs, actions=acts, advantages=adv,
                 agent_infos=info, valids=valids)
        )
        assert np.isfinite(diag["LossAfter"]) and np.isfinite(diag["MeanKL"])
    assert p_action0() > before + 0.05


def test_gaussian_conv_baseline_fits(tmp_path=None):
    """GaussianConvBaseline (rllab/baselines/gaussian_conv_baseline.py): conv
    value net over image observations; fitting moves predictions toward the
    returns (here: return = mean brightness, linearly decodable from pixels)."""
    from imitation_from_observation_tpu.rl import GaussianConvBaseline

    rng = np.random.default_rng(0)
    shape = (8, 8, 3)
    bl = GaussianConvBaseline(shape, conv_filters=(8,), conv_strides=(2,), hidden=(16,), epochs=40)
    paths = []
    for _ in range(6):
        obs = rng.uniform(-1, 1, (10, *shape)).astype(np.float32)
        paths.append(dict(observations=obs.reshape(10, -1), returns=obs.mean(axis=(1, 2, 3))))
    before = np.mean(
        [np.mean((bl.predict(p) - p["returns"]) ** 2) for p in paths]
    )
    for _ in range(10):
        bl.fit(paths)
    after = np.mean([np.mean((bl.predict(p) - p["returns"]) ** 2) for p in paths])
    assert after < before * 0.5, (before, after)
    # shaped observations predict identically to flat ones
    shaped = dict(observations=paths[0]["observations"].reshape(10, *shape), returns=paths[0]["returns"])
    np.testing.assert_allclose(bl.predict(shaped), bl.predict(paths[0]), rtol=1e-5, atol=1e-6)
