"""Test harness configuration.

Forces JAX onto CPU with 8 virtual devices BEFORE jax initializes, so sharding /
multi-chip logic is exercised without TPU hardware (the gap the reference's
CPU-only unit tests never closed - see SURVEY.md section 4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# XLA:CPU's default matmul precision is reduced (bf16-class); parity tests compare
# against fp32 torch, so force full precision.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
