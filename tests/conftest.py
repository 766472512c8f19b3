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

import subprocess

import numpy as np
import pytest

# Build the native runtime once so tests/test_native.py never silently
# skips where a toolchain exists (the .so is gitignored, not checked in).
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if not os.path.exists(os.path.join(_repo, "native", "libcvo_native.so")):
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_repo, "native")],
            capture_output=True, timeout=120, check=False,
        )
    except Exception:
        pass  # no toolchain: test_native.py skips as before


@pytest.fixture
def rng():
    return np.random.default_rng(0)
