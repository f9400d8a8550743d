"""Pallas flash attention vs the XLA reference path (interpret mode on CPU).

Covers the framework's real shapes: ViT self-attention (257 tokens, head dim 88),
Q-Former cross-attention geometry (padded keys), OPT causal prefill (head dim 80,
left padding), T5 relative-position bias, and edge cases (non-multiple lengths,
fully-masked rows)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu.ops.attention import _xla_attention
from eilev_tpu.ops.flash_attention import flash_attention


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def _compare(q, k, v, *, padding_mask=None, bias=None, causal=False, q_offset=0,
             scale=None, scale_query_first=False, atol=2e-5, valid_rows=None):
    """valid_rows: optional (B, S) bool - rows with at least one attendable key.
    Fully-masked rows are don't-care: flash emits zeros, XLA a uniform average."""
    ours = flash_attention(
        q, k, v, padding_mask=padding_mask, bias=bias, causal=causal,
        q_offset=q_offset, scale=scale, scale_query_first=scale_query_first,
        block_q=64, block_kv=64, interpret=True,
    )
    ref = _xla_attention(
        q, k, v, bias=bias, padding_mask=padding_mask, causal=causal,
        q_offset=q_offset, scale=scale, scale_query_first=scale_query_first,
        softmax_in_fp32=True,
    )
    ours, ref = np.asarray(ours), np.asarray(ref)
    if valid_rows is not None:
        ours = ours[valid_rows]
        ref = ref[valid_rows]
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=2e-5)


def test_vit_shape_no_mask():
    """257 tokens, head dim 88 (EVA-ViT) - both non-multiples of the tiling."""
    rng = np.random.default_rng(0)
    q = _rand(rng, 3, 257, 4, 88)
    k = _rand(rng, 3, 257, 4, 88)
    v = _rand(rng, 3, 257, 4, 88)
    _compare(q, k, v, scale=88**-0.5)


def test_causal_prefill_opt():
    """Causal + left padding + query-side scaling (OPT prefill)."""
    rng = np.random.default_rng(1)
    b, s, h, d = 2, 100, 2, 80
    q = _rand(rng, b, s, h, d)
    k = _rand(rng, b, s, h, d)
    v = _rand(rng, b, s, h, d)
    pm = np.ones((b, s), np.int32)
    pm[0, :17] = 0  # left padding: those query rows attend nothing (don't-care)
    _compare(q, k, v, padding_mask=jnp.asarray(pm), causal=True,
             scale=d**-0.5, scale_query_first=True,
             valid_rows=pm.astype(bool))


def test_prefill_into_padded_cache():
    """Keys longer than queries with trailing unfilled slots (cache prefill)."""
    rng = np.random.default_rng(2)
    b, s, l, h, d = 2, 70, 200, 2, 80
    q = _rand(rng, b, s, h, d)
    k = _rand(rng, b, l, h, d)
    v = _rand(rng, b, l, h, d)
    pm = np.zeros((b, l), np.int32)
    pm[:, :s] = 1  # only the first s slots are filled
    _compare(q, k, v, padding_mask=jnp.asarray(pm), causal=True, scale=d**-0.5)


def test_cross_attention_padded_keys():
    """Q-Former-style cross attention: short queries, long padded keys."""
    rng = np.random.default_rng(3)
    q = _rand(rng, 2, 64, 2, 64)
    k = _rand(rng, 2, 300, 2, 64)
    v = _rand(rng, 2, 300, 2, 64)
    pm = np.ones((2, 300), np.int32)
    pm[1, 250:] = 0
    _compare(q, k, v, padding_mask=jnp.asarray(pm), scale=64**-0.5)


def test_t5_bias():
    """Additive (H, S, L) bias shared over batch (T5 relative positions)."""
    rng = np.random.default_rng(4)
    b, s, h, d = 2, 90, 2, 64
    q = _rand(rng, b, s, h, d)
    k = _rand(rng, b, s, h, d)
    v = _rand(rng, b, s, h, d)
    bias = _rand(rng, h, s, s) * 2.0
    pm = np.ones((b, s), np.int32)
    pm[0, 80:] = 0
    _compare(q, k, v, bias=bias, padding_mask=jnp.asarray(pm), scale=None)


def test_fully_masked_rows_are_finite():
    """Rows whose keys are all masked must produce zeros, never NaN."""
    rng = np.random.default_rng(5)
    b, s, h, d = 1, 64, 1, 64
    q = _rand(rng, b, s, h, d)
    k = _rand(rng, b, s, h, d)
    v = _rand(rng, b, s, h, d)
    pm = np.zeros((b, s), np.int32)
    pm[:, 32:] = 1  # causal row 0..31 attends only masked keys -> fully masked
    out = flash_attention(
        q, k, v, padding_mask=jnp.asarray(pm), causal=True, scale=d**-0.5,
        block_q=64, block_kv=64, interpret=True,
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out[0, :32]), 0.0, atol=0)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dtypes(dtype):
    rng = np.random.default_rng(6)
    q = _rand(rng, 2, 128, 2, 64).astype(dtype)
    k = _rand(rng, 2, 128, 2, 64).astype(dtype)
    v = _rand(rng, 2, 128, 2, 64).astype(dtype)
    ours = flash_attention(
        q, k, v, causal=True, scale=0.125, block_q=64, block_kv=64, interpret=True
    )
    ref = _xla_attention(
        q, k, v, bias=None, padding_mask=None, causal=True, q_offset=0,
        scale=0.125, scale_query_first=False, softmax_in_fp32=True,
    )
    assert ours.dtype == dtype
    tol = 2e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref, np.float32), atol=tol, rtol=tol
    )
