"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4 implication). Must set the env
vars before jax is imported anywhere.
"""

import os
import sys

# Force CPU: the machine's sitecustomize registers the axon TPU backend and
# pins JAX_PLATFORMS=axon, so a plain setdefault would leave tests running
# through the TPU tunnel. Env must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent XLA compilation cache: backbone compiles dominate test wall time.
import jax  # noqa: E402

# The machine's sitecustomize registers the axon TPU plugin and pins the
# platform via jax.config, so the env var alone does not win — override
# through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/dgp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

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


from deepgraphpose_tpu.utils.synthetic import make_synthetic_project  # noqa: E402,F401 — re-export (CLAUDE.md / tests reference tests.conftest.make_synthetic_project)


@pytest.fixture(scope="session")
def synthetic_project(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthproj")
    return make_synthetic_project(root)
