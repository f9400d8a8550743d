"""Fused packed-QKV attention kernel vs the XLA einsum path (interpret on CPU).

The kernel consumes the packed (B, S, 3*H*D) QKV projection output directly
(ops/fused_attention.py) - the ViT hot path. Checks the real EVA-ViT geometry
(S=257, head_dim 88: both non-multiples of the 8/128 tiling), non-divisible
batch (fb padding path), fp32 and bf16, and the dispatch plumbing.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu.ops.attention import packed_qkv_self_attention
from eilev_tpu.ops.fused_attention import (
    _xla_packed_fallback,
    packed_qkv_attention,
)


def _compare(b, s, nh, hd, dtype, seed=0, atol=2e-5):
    rng = np.random.default_rng(seed)
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * nh * hd)).astype(np.float32), dtype)
    ours = packed_qkv_attention(qkv, nh, hd, scale=hd**-0.5, interpret=True)
    ref = _xla_packed_fallback(qkv, nh, hd, hd**-0.5)
    assert ours.shape == (b, s, nh * hd)
    assert ours.dtype == qkv.dtype
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref, np.float32), atol=atol, rtol=1e-3
    )


def test_vit_geometry_fp32():
    """S=257 / head_dim 88 at a small batch (EVA-ViT tile-unfriendly shape)."""
    _compare(3, 257, 2, 88, jnp.float32)


def test_vit_geometry_bf16():
    _compare(3, 257, 2, 88, jnp.bfloat16, atol=3e-2)


def test_batch_not_divisible_by_block():
    """b=5 with fb>1 exercises the pad-and-slice path."""
    _compare(5, 64, 4, 16, jnp.float32)


def test_single_frame():
    _compare(1, 40, 3, 24, jnp.float32)


def test_dispatch_fused_off_tpu_uses_interpreter():
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.normal(size=(2, 33, 3 * 2 * 20)).astype(np.float32))
    out = packed_qkv_self_attention(qkv, 2, 20, implementation="fused")
    ref = _xla_packed_fallback(qkv, 2, 20, 20**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-3)


def test_dispatch_auto_off_tpu_matches_einsum():
    rng = np.random.default_rng(4)
    qkv = jnp.asarray(rng.normal(size=(2, 17, 3 * 3 * 8)).astype(np.float32))
    out = packed_qkv_self_attention(qkv, 3, 8)  # auto -> einsum on CPU
    ref = _xla_packed_fallback(qkv, 3, 8, 8**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_packed_causal_matches_xla():
    """Causal+masked packed kernel (OPT prefill path): interpret mode vs the
    XLA reference at OPT-like geometry with left padding."""
    import numpy as np

    from eilev_tpu.ops.fused_attention import (
        _xla_packed_causal_fallback,
        packed_qkv_causal_attention,
    )

    rng = np.random.default_rng(11)
    b, s, nh, hd = 2, 24, 4, 8
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * nh * hd)), jnp.float32)
    mask = np.ones((b, s), np.int32)
    mask[0, :5] = 0  # left padding
    mask = jnp.asarray(mask)
    ref = _xla_packed_causal_fallback(qkv, nh, hd, mask, hd**-0.5)
    got = packed_qkv_causal_attention(qkv, nh, hd, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
