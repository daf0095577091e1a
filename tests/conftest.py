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
