"""Attention primitives.

One entry point, :func:`dot_product_attention`, serves every tower in the framework.
It exposes exactly the numerical knobs needed to match each HF parity target bit-for-
bit in fp32 (query-side vs score-side scaling, fp32 softmax, additive bias), and it
dispatches between a plain-XLA path (always available, differentiable, CPU-testable)
and a fused Pallas TPU flash-attention path for the hot shapes.

Reference behaviors being matched (see /root/reference and installed HF sources):
  - Blip2 vision attention: score-side scaling, softmax in compute dtype.
  - Blip2 Q-Former attention: score-side scaling, additive -10000 mask.
  - OPT attention: query-side scaling, softmax in fp32.
  - T5 attention: no scaling, additive relative-position bias.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Global switch; the Pallas kernel registers itself here when imported on TPU.
_FLASH_IMPL = None


def register_flash_impl(fn) -> None:
    global _FLASH_IMPL
    _FLASH_IMPL = fn


def use_flash() -> bool:
    return _FLASH_IMPL is not None


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    scale_query_first: bool = False,
    softmax_in_fp32: bool = False,
    implementation: str = "auto",
) -> jax.Array:
    """Multi-head scaled dot-product attention.

    Args:
      q: (batch, q_len, heads, head_dim)
      k: (batch, kv_len, heads, head_dim)
      v: (batch, kv_len, heads, head_dim)
      bias: optional additive bias broadcastable to (batch, heads, q_len, kv_len).
        Masking is expressed as a large negative bias (finite, to mirror HF and to
        avoid NaN on fully-masked rows).
      scale: multiplier for attention scores (typically head_dim**-0.5). ``None``
        means no scaling (T5).
      scale_query_first: multiply q by ``scale`` before the QK matmul instead of
        scaling the scores (OPT ordering; affects low-precision rounding).
      softmax_in_fp32: run the softmax in float32 and cast back (OPT behavior).
      implementation: "auto" | "xla" | "flash".

    Returns:
      (batch, q_len, heads, head_dim) attention output in q.dtype.
    """
    if implementation == "auto":
        implementation = "flash" if _FLASH_IMPL is not None else "xla"
    if implementation == "flash" and _FLASH_IMPL is not None:
        return _FLASH_IMPL(
            q,
            k,
            v,
            bias=bias,
            scale=scale,
            scale_query_first=scale_query_first,
            softmax_in_fp32=softmax_in_fp32,
        )
    return _xla_attention(
        q,
        k,
        v,
        bias=bias,
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
        scores = scores + bias.astype(scores.dtype)
    if softmax_in_fp32:
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(orig_dtype)
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhsl,blhd->bshd", probs, v)
    return out


def mask_to_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Boolean keep-mask -> additive bias using the dtype's most-negative finite
    value, mirroring HF's ``_update_causal_mask`` (finfo.min, not -inf, so fully
    masked rows softmax to uniform instead of NaN)."""
    big_neg = jnp.finfo(jnp.float32).min if dtype == jnp.float32 else jnp.finfo(dtype).min
    return jnp.where(mask, jnp.asarray(0.0, dtype), jnp.asarray(big_neg, dtype))


def make_causal_bias(q_len: int, kv_len: int, *, offset: int = 0, dtype=jnp.float32) -> jax.Array:
    """Additive causal bias of shape (1, 1, q_len, kv_len).

    ``offset`` is the absolute position of query 0 within the kv axis (used during
    incremental decoding where queries sit at the end of the cache).
    """
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0) + offset
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
    keep = k_pos <= q_pos
    return mask_to_bias(keep, dtype)[None, None]


@functools.partial(jax.jit, static_argnames=("dtype",))
def padding_bias(attention_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, L) 0/1 padding mask -> (B, 1, 1, L) additive bias."""
    return mask_to_bias(attention_mask.astype(bool), dtype)[:, None, None, :]
