"""Test harness configuration.

Forces JAX onto CPU with 8 virtual devices BEFORE backend init, so sharding /
multi-chip logic is exercised without TPU hardware (the gap the reference's
CPU-only unit tests never closed - see SURVEY.md section 4).

NOTE: this environment presets JAX_PLATFORMS=axon (the TPU tunnel) and the axon
plugin wins over the env var - ``jax.config.update("jax_platforms", ...)`` is the
only reliable override here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA matmuls default to reduced precision; parity tests compare against fp32
# torch, so force full precision.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def pytest_configure(config):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
