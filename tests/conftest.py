"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4 implication). Must set the env
vars before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_PROJECT = "/root/reference/data/Reaching-Mackenzie-2018-08-30"


@pytest.fixture(scope="session")
def reference_project_available():
    if not os.path.isdir(REFERENCE_PROJECT):
        pytest.skip("reference demo project not available")
    return REFERENCE_PROJECT


@pytest.fixture
def rng():
    return np.random.default_rng(0)
