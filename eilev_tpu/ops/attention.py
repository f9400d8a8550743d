"""Attention primitives.

One entry point, :func:`dot_product_attention`, serves every tower in the framework.
It takes *structured* masking info (causal flag + query offset, key padding mask,
optional additive bias) so the Pallas flash path never materializes (B, H, S, L)
bias tensors, and it exposes exactly the numerical knobs needed to match each HF
parity target in fp32 (query-side vs score-side scaling, fp32 softmax).

Reference behaviors being matched (see /root/reference and installed HF sources):
  - Blip2 vision attention: score-side scaling, softmax in compute dtype.
  - Blip2 Q-Former attention: score-side scaling, additive key-padding mask.
  - OPT attention: query-side scaling, softmax in fp32, causal + padding.
  - T5 attention: no scaling, additive relative-position bias.

Dispatch: "auto" uses the Pallas flash kernel (ops/flash_attention.py) for
big-sequence shapes on TPU (interpret mode elsewhere, for tests) and the plain
XLA einsum path for small/decode shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_DEFAULT_IMPL = "auto"
# Flash pays off when the materialized (B, H, S, L) score tensor would hurt -
# measured end-to-end on v5e, XLA's fused attention WINS at the flagship shapes
# (S=257 ViT, ~730-token OPT prefill: 12.85 vs 12.38 videos/s) because the
# 88/80-lane head dims pad to 128 in the kernel. Auto only picks flash for
# genuinely long sequences; it remains explicitly selectable.
_FLASH_MIN_Q = 1024
_FLASH_MIN_KV = 2048


def set_default_attention_impl(impl: str) -> None:
    """Set the global attention implementation: 'auto' | 'xla' | 'flash' | 'fused'."""
    global _DEFAULT_IMPL
    assert impl in ("auto", "xla", "flash", "fused"), impl
    _DEFAULT_IMPL = impl


def get_default_attention_impl() -> str:
    return _DEFAULT_IMPL


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu", "gpu")


def packed_qkv_self_attention(
    qkv: jax.Array,
    num_heads: int,
    head_dim: int,
    *,
    scale: Optional[float] = None,
    implementation: Optional[str] = None,
) -> jax.Array:
    """Mask-free self-attention straight off a packed (B, S, 3*H*D) QKV tensor.

    The ViT hot path (all tokens valid, no causal/padding masks). On TPU the
    fused Pallas kernel (ops/fused_attention.py) consumes the packed layout
    directly — the per-head lane extraction happens in VMEM, which beats both
    XLA's HBM-materialized scores and any host-side (B,S,H,D)->(B,H,S,D)
    relayout (head_dim 88/80/64 crosses the 128-lane tile boundary). Off-TPU
    (CPU tests) this falls back to the einsum path; ``implementation='fused'``
    forces the kernel in interpret mode for kernel-correctness tests.
    """
    from .fused_attention import _xla_packed_fallback, packed_qkv_attention

    impl = implementation or _DEFAULT_IMPL
    if scale is None:
        scale = head_dim**-0.5
    if impl in ("auto", "flash", "fused") and _on_tpu():
        return packed_qkv_attention(qkv, num_heads, head_dim, scale=scale)
    if impl == "fused":  # explicit request off-TPU: interpreter (tests)
        return packed_qkv_attention(
            qkv, num_heads, head_dim, scale=scale, interpret=True
        )
    return _xla_packed_fallback(qkv, num_heads, head_dim, scale)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    padding_mask: Optional[jax.Array] = None,
    causal: bool = False,
    q_offset: int = 0,
    scale: Optional[float] = None,
    scale_query_first: bool = False,
    softmax_in_fp32: bool = False,
    implementation: Optional[str] = None,
) -> jax.Array:
    """Multi-head scaled dot-product attention.

    Args:
      q: (batch, q_len, heads, head_dim); k, v: (batch, kv_len, heads, head_dim).
      bias: optional additive bias - (heads, q_len, kv_len) broadcast over batch
        (flash-compatible, e.g. T5 relpos) or any shape broadcastable to
        (batch, heads, q_len, kv_len) (XLA path only).
      padding_mask: optional (batch, kv_len) 0/1 keep-mask over keys.
      causal: apply causal masking; ``q_offset`` is the absolute position of
        query 0 along the key axis (static; prefill-at-0 in this framework).
      scale: score multiplier (head_dim**-0.5); None = no scaling (T5).
      scale_query_first: multiply q before the QK matmul (OPT ordering).
      softmax_in_fp32: run softmax in float32 and cast back (OPT).
      implementation: override 'auto' | 'xla' | 'flash'.

    Returns (batch, q_len, heads, head_dim) in q.dtype.
    """
    impl = implementation or _DEFAULT_IMPL
    if impl == "auto":
        flash_ok = (
            q.shape[1] >= _FLASH_MIN_Q
            and k.shape[1] >= _FLASH_MIN_KV
            and (bias is None or bias.ndim == 3)
        )
        impl = "flash" if flash_ok else "xla"

    if impl == "flash":
        from .flash_attention import flash_attention

        assert bias is None or bias.ndim == 3, "flash bias must be (H, S, L)"
        return flash_attention(
            q,
            k,
            v,
            padding_mask=padding_mask,
            bias=bias,
            causal=causal,
            q_offset=q_offset,
            scale=scale,
            scale_query_first=scale_query_first,
            interpret=not _on_tpu(),
        )

    return _xla_attention(
        q,
        k,
        v,
        bias=bias,
        padding_mask=padding_mask,
        causal=causal,
        q_offset=q_offset,
        scale=scale,
        scale_query_first=scale_query_first,
        softmax_in_fp32=softmax_in_fp32,
    )


def _xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array],
    padding_mask: Optional[jax.Array],
    causal: bool,
    q_offset: int,
    scale: Optional[float],
    scale_query_first: bool,
    softmax_in_fp32: bool,
) -> jax.Array:
    orig_dtype = q.dtype
    if scale is not None and scale_query_first:
        q = q * jnp.asarray(scale, dtype=q.dtype)
    # (B, H, S, L)
    scores = jnp.einsum("bshd,blhd->bhsl", q, k)
    if scale is not None and not scale_query_first:
        scores = scores * jnp.asarray(scale, dtype=scores.dtype)
    if bias is not None:
        b4 = bias if bias.ndim != 3 else bias[None]
        scores = scores + b4.astype(scores.dtype)
    # combine causal + padding into ONE where() (adding two finfo.min biases
    # would overflow to -inf and make fully-masked rows softmax to NaN, which
    # poisons gradients; HF's _update_causal_mask also keeps a single min)
    keep = None
    if causal:
        s_len, l_len = q.shape[1], k.shape[1]
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (s_len, l_len), 0) + q_offset
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (s_len, l_len), 1)
        keep = (k_pos <= q_pos)[None, None]
    if padding_mask is not None:
        pm = padding_mask.astype(bool)[:, None, None, :]
        keep = pm if keep is None else jnp.logical_and(keep, pm)
    if keep is not None:
        scores = jnp.where(keep, scores, jnp.asarray(jnp.finfo(jnp.float32).min, scores.dtype))
    if softmax_in_fp32:
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(orig_dtype)
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhsl,blhd->bshd", probs, v)


def mask_to_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Boolean keep-mask -> additive bias using the dtype's most-negative finite
    value, mirroring HF's ``_update_causal_mask`` (finfo.min, not -inf, so fully
    masked rows softmax to uniform instead of NaN)."""
    return jnp.where(mask, jnp.asarray(0.0, dtype), jnp.asarray(jnp.finfo(dtype).min, dtype))


def make_causal_bias(q_len: int, kv_len: int, *, offset: int = 0, dtype=jnp.float32) -> jax.Array:
    """Additive causal bias of shape (1, 1, q_len, kv_len); ``offset`` is the
    absolute position of query 0 within the kv axis."""
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0) + offset
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
    return mask_to_bias(k_pos <= q_pos, dtype)[None, None]
