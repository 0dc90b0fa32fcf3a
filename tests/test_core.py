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


def test_package_imports_without_a_device():
    """Importing any module must not initialize a jax backend: the study
    CLIs (plotting, spec tooling) have to work while the TPU relay is down,
    and import-time device constants once made even viskit crash during an
    outage. JAX_PLATFORMS points at a platform that cannot initialize, so
    any import-time backend touch raises."""
    import subprocess
    import sys

    code = (
        "import pkgutil, importlib\n"
        "import imitation_from_observation_tpu as pkg\n"
        "for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + '.'):\n"
        "    if m.name.rsplit('.', 1)[-1].startswith('lib'):\n"
        "        continue  # native ctypes .so files, not python modules\n"
        "    importlib.import_module(m.name)\n"
        "print('device-free import ok')\n"
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="no_such_platform", PYTHONPATH=root)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "device-free import ok" in out.stdout
