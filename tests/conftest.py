"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container pre-imports jax (sitecustomize registers the TPU plugin),
so plain env vars are too late; use jax.config to pin the CPU platform
and XLA_FLAGS (read at first CPU-backend creation) for virtual devices.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("SEQALIGN_SCALE_TESTS") != "1":
    # Scale tests (tests/test_scale.py) need the real TPU backend; the
    # regular suite runs on the virtual CPU mesh.
    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _repo_cwd(monkeypatch):
    """Data/score-matrix paths are repo-relative, like the reference."""
    monkeypatch.chdir(REPO_ROOT)
