"""Core-layer units: logger schema growth, checkpoint round-trips, snapshot
policies, config serialization, rng streams."""

import os

import jax
import numpy as np
import pytest

from imitation_from_observation_tpu.core.checkpoint import (
    SnapshotManager,
    checkpoint_meta,
    load_pytree,
    save_pytree,
)
from imitation_from_observation_tpu.core.config import (
    EnvConfig,
    ExperimentConfig,
    TranslationModelConfig,
    preset,
)
from imitation_from_observation_tpu.core.log import Logger
from imitation_from_observation_tpu.core.rng import RngStream, host_rng


def test_logger_tabular_and_schema_growth(tmp_path):
    log = Logger(str(tmp_path), stdout=False)
    log.record_tabular("A", 1)
    log.dump_tabular()
    log.record_tabular("A", 2)
    log.record_tabular("B", 3)  # schema grows
    log.dump_tabular()
    rows = (tmp_path / "progress.csv").read_text().splitlines()
    assert rows[0] == "A,B"
    assert rows[1].startswith("1")  # first row backfilled with empty B
    assert rows[2] == "2,3"
    with log.prefix("p1 | "):
        log.log("inside")
    assert "p1 | inside" in (tmp_path / "debug.log").read_text()
    log.close()


def test_logger_misc_stat(tmp_path):
    log = Logger(str(tmp_path), stdout=False)
    log.record_tabular_misc_stat("R", [1.0, 2.0, 3.0])
    row = log.dump_tabular()
    assert row["RAverage"] == 2.0 and row["RMin"] == 1.0 and row["RMax"] == 3.0


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(6).reshape(2, 3).astype(np.float32), "b": {"c": np.ones(4)}}
    path = str(tmp_path / "ck")
    save_pytree(path, tree, step=7, meta={"x": 1})
    back = load_pytree(path, tree)
    np.testing.assert_array_equal(back["a"], tree["a"])
    np.testing.assert_array_equal(back["b"]["c"], tree["b"]["c"])
    assert checkpoint_meta(path)["step"] == 7
    # shape mismatch raises
    bad = {"a": np.zeros((3, 3)), "b": {"c": np.ones(4)}}
    with pytest.raises(ValueError):
        load_pytree(path, bad)


@pytest.mark.parametrize("mode,expected", [("all", 3), ("last", 1), ("gap", 2), ("none", 0)])
def test_snapshot_modes(tmp_path, mode, expected):
    sm = SnapshotManager(str(tmp_path / mode), mode=mode, gap=2)
    for itr in range(3):
        sm.save(itr, {"w": np.ones(2) * itr})
    n = sum(f.endswith(".npz") for f in os.listdir(tmp_path / mode))
    assert n == expected
    if mode == "all":
        assert sm.latest().endswith("itr_2")


def test_config_json_and_presets(tmp_path):
    cfg = preset("push")
    assert cfg.env.name == "pusher3dof"
    assert cfg.model.model == "context_skip"
    assert preset("sweep").model.model == "context_small"
    assert preset("strike_inception").model.model == "context_feat"
    p = tmp_path / "cfg.json"
    cfg.save(str(p))
    import json

    loaded = json.loads(p.read_text())
    assert loaded["env"]["name"] == "pusher3dof"
    # frozen: replace returns a new object
    cfg2 = cfg.replace(name="x")
    assert cfg.name != "x" and cfg2.name == "x"


def test_rng_stream_unique_keys():
    s = RngStream(0)
    k1, k2 = s.next(), s.next()
    assert not np.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))
    fork = s.fork()
    assert isinstance(fork, RngStream)
    g1, g2 = host_rng(0, "a"), host_rng(0, "b")
    assert g1.integers(1 << 30) != g2.integers(1 << 30)


def test_box_space():
    from imitation_from_observation_tpu.sim.base import Box

    b = Box(-np.ones(3), np.ones(3))
    assert b.flat_dim == 3
    x = b.sample(np.random.default_rng(0))
    assert b.contains(x)
    assert not b.contains(np.array([2.0, 0, 0]))
