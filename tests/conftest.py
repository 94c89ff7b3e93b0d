"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes; tests import seqalign_tpu
only after this module loads.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _repo_cwd(monkeypatch):
    """Data/score-matrix paths are repo-relative, like the reference."""
    monkeypatch.chdir(REPO_ROOT)
