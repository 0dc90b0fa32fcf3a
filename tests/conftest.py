"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware isn't available in CI; sharding/collective logic is
validated on 8 virtual CPU devices instead (the driver separately dry-runs
the multi-chip path via ``__graft_entry__.dryrun_multichip``). These env vars
must be set before jax initializes a backend, hence at conftest import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("MUJOCO_GL", "egl")

# The image's sitecustomize imports jax and registers the TPU plugin before
# conftest runs, so the env var alone is too late — override the live config.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
