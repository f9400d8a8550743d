"""Fused LN+MLP Pallas kernel (ops/fused_mlp.py): parity vs the flax path."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu.ops.fused_mlp import _xla_fallback, ln_mlp


def _inputs(dtype, B=4, S=16, D=32, F=64, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(B, S, D)), dtype),
        jnp.asarray(rng.normal(size=(D,)), dtype),
        jnp.asarray(rng.normal(size=(D,)) * 0.1, dtype),
        jnp.asarray(rng.normal(size=(D, F)) * 0.1, dtype),
        jnp.asarray(rng.normal(size=(F,)) * 0.1, dtype),
        jnp.asarray(rng.normal(size=(F, D)) * 0.1, dtype),
        jnp.asarray(rng.normal(size=(D,)) * 0.1, dtype),
    )


def test_kernel_matches_flax_fp32():
    x, ln_s, ln_b, w1, b1, w2, b2 = _inputs(jnp.float32)
    D, F = w1.shape

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.LayerNorm(use_fast_variance=False, epsilon=1e-6)(x)
            h = nn.Dense(F, name="fc1")(h)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(D, name="fc2")(h)

    params = {
        "LayerNorm_0": {"scale": ln_s, "bias": ln_b},
        "fc1": {"kernel": w1, "bias": b1},
        "fc2": {"kernel": w2, "bias": b2},
    }
    ref = M().apply({"params": params}, x)
    got = ln_mlp(x, ln_s, ln_b, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_kernel_matches_fallback_bf16():
    args = _inputs(jnp.bfloat16)
    ref = _xla_fallback(*args, eps=1e-6)
    got = ln_mlp(*args, eps=1e-6, interpret=True)
    # both paths do fp32 stats/accum and cast at the same points; only the
    # pallas interpreter's rounding may differ at the last bf16 bit
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_odd_batch_uses_unit_block():
    """An odd frame count blocks at fb=1 and still matches."""
    x, ln_s, ln_b, w1, b1, w2, b2 = _inputs(jnp.float32, B=3)
    ref = _xla_fallback(x, ln_s, ln_b, w1, b1, w2, b2, eps=1e-6)
    got = ln_mlp(x, ln_s, ln_b, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_oversize_rows_fall_back():
    """Rows too large for VMEM route to the XLA fallback (same math)."""
    from eilev_tpu.ops import fused_mlp

    assert fused_mlp._pick_fb(2, 4096, 32, 8192, 2) is None
