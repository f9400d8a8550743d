"""Pallas decode-step attention over the stacked KV cache (TPU).

The decode step reads the whole (B, S, H*hd) K/V cache of every layer to
attend one new token (reference workload: the autoregressive loop behind
``VideoBlipForConditionalGeneration.generate``, /root/reference/eilev/model/
v2.py:318-322). Measured on v5e at the flagship shape (B=4, S≈800, 32 heads
x 80), XLA's batched-gemv attention streams the cache at ~305 GB/s while a
fully-contiguous read reaches ~454 GB/s (benchmarks/decode_variants.py). This
kernel reads each (S, H*hd) cache block whole into VMEM — the layout the
cache already has — extracts heads in VMEM (the same misaligned-lane trick as
ops/fused_attention.py), and fuses mask + fp32 softmax, so the per-head score
vectors never round-trip HBM.

The bigger prize is the INT8 cache variant: round 2 measured that XLA
materializes the int8->bf16 dequant of the cache (2.9 vs 3.4 ms/step — the
halving is lost; docs/PERF.md "int8 KV cache"). Here the cache is read as
int8 — HALF the HBM traffic, the true win — and dequantized in VMEM with
per-(position, head) bf16 scales from a small side buffer (+2.5% traffic).
Serving-mode only (int8 rounding is not bf16-parity); the bf16 path of the
same kernel follows the XLA decode numerics exactly (q scaled+rounded before
the matmul, scores rounded to model dtype, f32-finfo.min masking, fp32
softmax) and is validated token-identical in tests.

Layer index is STATIC (the model's layer loop is unrolled), so each layer's
pallas_call block-indexes its row of the stacked (L, B, S, H*hd) buffers
directly — no 33 MB dynamic-slice materialization per layer.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _kernel_bf16(
    q_ref, k_ref, v_ref, m_ref, o_ref, *, num_heads, kv_heads, head_dim, scale,
    scale_query,
):
    q = q_ref[0]  # (1, H*hd)
    k = k_ref[0, 0]  # (S, KVH*hd)
    v = v_ref[0, 0]
    m = m_ref[0]  # (1, S)
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, q.dtype)
    keep = m > 0
    group = num_heads // kv_heads
    for h in range(num_heads):
        lo = h * head_dim
        klo = (h // group) * head_dim
        qh = q[:, lo : lo + head_dim]
        if scale_query:
            qh = (qh * scale).astype(q.dtype)  # HF OPT: q-side, rounded
        s = jax.lax.dot_general(
            qh, k[:, klo : klo + head_dim], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, S) fp32 accumulate
        sb = s.astype(q.dtype)
        if not scale_query:
            sb = sb * jnp.asarray(scale, q.dtype)  # HF LLaMA: score-side
        sb = jnp.where(keep, sb, neg)
        p = jax.nn.softmax(sb.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jax.lax.dot_general(
            p, v[:, klo : klo + head_dim], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, lo : lo + head_dim] = o.astype(o_ref.dtype)


def _kernel_int8(
    q_ref, k_ref, v_ref, ks_ref, vs_ref, m_ref, o_ref, *, num_heads, kv_heads,
    head_dim, scale, scale_query,
):
    q = q_ref[0]  # (1, H*hd) model dtype
    k = k_ref[0, 0]  # (S, KVH*hd) int8
    v = v_ref[0, 0]
    ks = ks_ref[0, 0]  # (S, KVH) bf16 per-(position, head) scales
    vs = vs_ref[0, 0]
    m = m_ref[0]
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, q.dtype)
    keep = m > 0
    group = num_heads // kv_heads
    for h in range(num_heads):
        lo = h * head_dim
        g = h // group
        klo = g * head_dim
        qh = q[:, lo : lo + head_dim]
        if scale_query:
            qh = (qh * scale).astype(q.dtype)
        kh = (
            k[:, klo : klo + head_dim].astype(jnp.float32)
            * ks[:, g : g + 1].astype(jnp.float32)
        ).astype(q.dtype)
        vh = (
            v[:, klo : klo + head_dim].astype(jnp.float32)
            * vs[:, g : g + 1].astype(jnp.float32)
        ).astype(q.dtype)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        sb = s.astype(q.dtype)
        if not scale_query:
            sb = sb * jnp.asarray(scale, q.dtype)
        sb = jnp.where(keep, sb, neg)
        p = jax.nn.softmax(sb.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, :, lo : lo + head_dim] = o.astype(o_ref.dtype)


def decode_attention_stacked(
    q: jax.Array,
    k_buf: jax.Array,
    v_buf: jax.Array,
    mask: jax.Array,
    layer: int,
    *,
    num_heads: int,
    head_dim: int,
    kv_heads: Optional[int] = None,
    scale: Optional[float] = None,
    scale_query: bool = True,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Single-token attention against layer ``layer`` of the stacked cache.

    Args:
      q: (B, num_heads*head_dim) query for the new token (model dtype).
      k_buf/v_buf: (L, B, S, kv_heads*head_dim) cache — model dtype, or int8
        with ``k_scale``/``v_scale`` (L, B, S, kv_heads) bf16 dequant scales.
      mask: (B, S) 0/1 keep-mask over cache slots (padding + unfilled).
      layer: STATIC layer index into the leading cache axis.
      kv_heads: for grouped-query attention (LLaMA); default num_heads.
      scale_query: True = scale+round q before the matmul (HF OPT); False =
        scale the rounded scores (HF LLaMA).

    Returns (B, num_heads*head_dim) in q.dtype.
    """
    b, d = q.shape
    kv_heads = kv_heads or num_heads
    dkv = kv_heads * head_dim
    is_int8 = k_buf.dtype == jnp.int8
    l, bb, s_len, packed = k_buf.shape
    assert bb == b and packed == dkv and d == num_heads * head_dim, (
        k_buf.shape, q.shape, num_heads, kv_heads, head_dim,
    )
    assert (k_scale is not None) == is_int8 and (v_scale is not None) == is_int8
    if scale is None:
        scale = head_dim**-0.5

    cache_spec = pl.BlockSpec(
        (1, 1, s_len, dkv), lambda i: (layer, i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cache_spec,
        cache_spec,
    ]
    operands = [q[:, None, :], k_buf, v_buf]
    kw = dict(
        num_heads=num_heads, kv_heads=kv_heads, head_dim=head_dim, scale=scale,
        scale_query=scale_query,
    )
    if is_int8:
        scale_spec = pl.BlockSpec(
            (1, 1, s_len, kv_heads), lambda i: (layer, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [scale_spec, scale_spec]
        operands += [k_scale, v_scale]
        kernel = functools.partial(_kernel_int8, **kw)
    else:
        kernel = functools.partial(_kernel_bf16, **kw)
    in_specs.append(
        pl.BlockSpec((1, 1, s_len), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    )
    operands.append(mask.astype(jnp.int32)[:, None, :])

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * s_len * head_dim,
            bytes_accessed=2 * b * s_len * d * k_buf.dtype.itemsize,
            transcendentals=b * num_heads * s_len,
        ),
        interpret=interpret,
    )(*operands)
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# int8 cache write side (XLA; per-step tensors are tiny)
# ---------------------------------------------------------------------------


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., H, hd) model-dtype K or V rows -> (int8 values (..., H, hd),
    bf16 per-head scales (..., H)) for the int8 cache buffers."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)  # (..., H)
    scale = (amax / 127.0).astype(jnp.bfloat16)
    inv = jnp.where(scale > 0, 1.0 / scale.astype(jnp.float32), 0.0)[..., None]
    vals = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)
    return vals, scale


def dequantize_kv(vals: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Reference dequant for tests / XLA fallback: (..., H, hd) int8 +
    (..., H) scales -> (..., H, hd) in ``dtype``."""
    return (vals.astype(jnp.float32) * scale.astype(jnp.float32)[..., None]).astype(dtype)
