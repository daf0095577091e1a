"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver environment preloads a TPU backend via sitecustomize; tests must
run on CPU with 8 virtual devices so sharded code paths execute without a
pod (SURVEY.md §4 plan item d). XLA_FLAGS must be set before the CPU client
is instantiated, and the platform switch must happen before any backend use.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The suite accumulates ~100 large jitted programs (sharded train steps,
    interpret-mode Pallas kernels); past that point XLA:CPU's compiler has
    been observed to segfault deterministically inside
    backend_compile_and_load (jaxlib 0.9.0). Dropping the in-memory
    executable cache at module boundaries keeps the process well inside
    the stable regime at the cost of a few cross-module recompiles.
    """
    yield
    jax.clear_caches()
