"""Test harness: run all tests on a virtual 8-device CPU mesh.

This is the standard way to test pjit/shard_map/psum code without a real TPU
pod — the driver separately dry-run-compiles the multi-chip path via
__graft_entry__.dryrun_multichip.
"""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS; this config update wins over it.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
