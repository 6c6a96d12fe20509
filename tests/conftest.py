"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the reference tests hardware
decisions with unittest.mock fakes, test_backend_selection.py:222-282; our
moral equivalent for multi-chip logic is XLA's forced host-platform device
count — SURVEY.md §4). jax.config must be set before any backend
initialization, hence the top-of-module ordering here.
"""

import os

os.environ["GRAPHEM_RAPIDS_QUIET"] = "true"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "fast: quick tests, run in CI")
    config.addinivalue_line("markers", "slow: long-running tests")
    config.addinivalue_line("markers", "integration: end-to-end tests")
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
    config.addinivalue_line("markers", "multichip: exercises the CPU mesh")


@pytest.fixture
def random_seed():
    return 42


@pytest.fixture
def small_graph_adjacency():
    """K4 complete graph as sparse adjacency."""
    import scipy.sparse as sp

    dense = np.ones((4, 4), int) - np.eye(4, dtype=int)
    return sp.csr_matrix(dense)
