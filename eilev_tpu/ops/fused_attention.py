"""Fused whole-row attention kernels (Pallas TPU) for the framework's hot shapes.

Motivation (measured on v5e, 544 frames x 16 heads x 257 tokens x 88 head-dim,
the EVA-ViT shape that carries ~95% of the 16-shot EILeV workload FLOPs —
reference model at /root/reference/eilev/model/v2.py:169-174):

  - XLA einsum attention materializes the (B, H, S, S) fp32 score tensor in HBM
    (~2.3 GB/layer) -> ~21.8 ms/layer, vs ~1 ms of MXU FLOPs.
  - A flash-attention-2 style blocked kernel (ops/flash_attention.py) fixes the
    score traffic but pays host-side transpose+pad copies, and its tiny
    (128, 128) tiles leave the MXU idle at S=257: it *loses* to XLA here.
  - The (B, S, H*D) -> (B, H, S, D) relayout that any per-head-laid-out kernel
    needs is NOT a cheap transpose: head_dim 88 crosses the 128-lane tile
    boundary, so XLA lowers it to lane-shuffles (~9.5 ms/layer measured).

This kernel therefore consumes the *packed* QKV projection output (B, S, 3*H*D)
directly — the misaligned per-head lane extraction happens in VMEM where it
costs ~2 ms/layer — and computes each head's full S x S attention without the
scores ever touching HBM. Sequences this short (S <= ~1k) fit whole rows in
VMEM, so no online-softmax bookkeeping is needed. Measured: ~7 ms/layer, a
~3x win over XLA and ~2x over kernel+relayout (benchmarks/attn_layout.py,
benchmarks/attn_kernel_parts.py).

Dispatch policy lives in ops.attention.dot_product_attention; the vision tower
calls :func:`packed_qkv_attention` directly with its fused QKV GEMM output.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Largest packed-QKV input block we let one grid step hold (empirically fine on
# v5e with vmem_limit below; double-buffered by the Mosaic pipeline).
import os as _os

_IN_BLOCK_BUDGET_BYTES = int(
    _os.environ.get("EILEV_ATTN_BLOCK_BUDGET", str(9 * 1024 * 1024))
)
_VMEM_LIMIT = 100 * 1024 * 1024


def _pick_block(
    b: int, s: int, packed_dim: int, itemsize: int,
    budget: int = _IN_BLOCK_BUDGET_BYTES,
) -> Optional[int]:
    """Largest fb in {8,4,2,1} whose input block fits the VMEM budget."""
    for fb in (8, 4, 2, 1):
        if fb * s * packed_dim * itemsize <= budget:
            return fb
    return None


def _packed_kernel(qkv_ref, o_ref, *, num_heads: int, head_dim: int, scale: float):
    x = qkv_ref[:]  # (fb, S, 3*H*HD)
    d = num_heads * head_dim
    for h in range(num_heads):
        lo = h * head_dim
        q = x[:, :, lo : lo + head_dim]
        k = x[:, :, d + lo : d + lo + head_dim]
        v = x[:, :, 2 * d + lo : 2 * d + lo + head_dim]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (fb, S, S) fp32 accumulate, VMEM-resident
        # HF Blip2 bf16 numerics: the matmul OUTPUT is rounded to model dtype,
        # the scale applied in model dtype, and torch's softmax upcasts
        # internally to fp32 — so round here, then fp32 softmax.
        sb = s.astype(x.dtype) * jnp.asarray(scale, x.dtype)
        p = jax.nn.softmax(sb.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        o_ref[:, :, lo : lo + head_dim] = o.astype(o_ref.dtype)


def packed_qkv_attention(
    qkv: jax.Array,
    num_heads: int,
    head_dim: int,
    *,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Bidirectional multi-head attention on a packed QKV tensor.

    Args:
      qkv: (B, S, 3*num_heads*head_dim) — the fused QKV projection output laid
        out as [q_heads | k_heads | v_heads] (HF Blip2 vision qkv order,
        /root/reference/eilev/model/v2.py vision tower via Blip2VisionModel).
      scale: score multiplier; defaults to head_dim**-0.5.

    Returns (B, S, num_heads*head_dim) in qkv.dtype. No masking: every query
    attends every key (the ViT use case — all 257 patch+CLS tokens are valid).
    """
    b, s, packed = qkv.shape
    d = num_heads * head_dim
    assert packed == 3 * d, (packed, num_heads, head_dim)
    if scale is None:
        scale = head_dim**-0.5

    fb = _pick_block(b, s, packed, qkv.dtype.itemsize)
    if fb is None:  # sequence too long for whole-row VMEM residency
        return _xla_packed_fallback(qkv, num_heads, head_dim, scale)

    pad_b = (-b) % fb
    if pad_b:
        qkv = jnp.pad(qkv, ((0, pad_b), (0, 0), (0, 0)))
    bp = b + pad_b

    out = pl.pallas_call(
        functools.partial(
            _packed_kernel, num_heads=num_heads, head_dim=head_dim, scale=scale
        ),
        grid=(bp // fb,),
        in_specs=[
            pl.BlockSpec((fb, s, packed), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (fb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, s, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * s * s * head_dim,
            bytes_accessed=(qkv.size + b * s * d) * qkv.dtype.itemsize,
            transcendentals=b * num_heads * s * s,
        ),
        interpret=interpret,
    )(qkv)
    return out[:b] if pad_b else out


def _xla_packed_fallback(
    qkv: jax.Array, num_heads: int, head_dim: int, scale: float
) -> jax.Array:
    b, s, _ = qkv.shape
    r = qkv.reshape(b, s, 3, num_heads, head_dim)
    q, k, v = r[:, :, 0], r[:, :, 1], r[:, :, 2]
    # same numerics as _packed_kernel: scores rounded to input dtype, fp32
    # softmax (torch upcasts bf16 softmax internally), probs back to dtype
    scores = jnp.einsum("bshd,blhd->bhsl", q, k) * jnp.asarray(scale, q.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhsl,blhd->bshd", probs, v)
    return out.reshape(b, s, num_heads * head_dim)


def _packed_causal_kernel(
    qkv_ref, mask_ref, o_ref, *, num_heads: int, head_dim: int, scale: float
):
    x = qkv_ref[:]  # (fb, S, 3*H*HD)
    m = mask_ref[:, 0, :]  # (fb, S) — shipped (B, 1, S): legal leading-dim block
    s_len = x.shape[1]
    d = num_heads * head_dim
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (s_len, s_len), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (s_len, s_len), 1)
    keep = jnp.logical_and((k_pos <= q_pos)[None], (m > 0)[:, None, :])  # (fb,S,S)
    # f32 finfo.min in model dtype — exactly the masking value the XLA path
    # (ops/attention._xla_attention) applies to its model-dtype score tensor
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, x.dtype)
    for h in range(num_heads):
        lo = h * head_dim
        # HF OPT ordering: q scaled (and rounded to model dtype) BEFORE the matmul
        q = (x[:, :, lo : lo + head_dim] * scale).astype(x.dtype)
        k = x[:, :, d + lo : d + lo + head_dim]
        v = x[:, :, 2 * d + lo : 2 * d + lo + head_dim]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        # HF bf16 numerics: the bmm output is ROUNDED to model dtype before
        # masking; only the softmax runs in fp32 (OPTAttention upcasts).
        sb = jnp.where(keep, s.astype(x.dtype), neg)
        p = jax.nn.softmax(sb.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        o_ref[:, :, lo : lo + head_dim] = o.astype(o_ref.dtype)


def packed_qkv_causal_attention(
    qkv: jax.Array,
    num_heads: int,
    head_dim: int,
    padding_mask: jax.Array,
    *,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Causal + key-padding-masked attention off a packed (B, S, 3*H*D) QKV.

    The OPT prefill hot path (B=4, S~770, head_dim 80): same whole-row-in-VMEM
    structure as :func:`packed_qkv_attention`, so the (B, H, S, S) fp32 score
    tensor (~300 MB/layer at the flagship shape) never touches HBM. Numerics
    preserve HF OPT exactly: q scaled then rounded to model dtype before the
    matmul, masking with f32 finfo.min, softmax in fp32
    (transformers OPTAttention; reference drives it via v2.py:124).

    padding_mask: (B, S) 0/1 keep-mask over keys. Queries are at offset 0
    (prefill-at-0 — the only multi-token case in this framework, opt.py:333).
    """
    b, s, packed = qkv.shape
    d = num_heads * head_dim
    assert packed == 3 * d, (packed, num_heads, head_dim)
    if scale is None:
        scale = head_dim**-0.5

    # OPT prefill rows are wide (S~770 x 7680 packed = ~12 MB at fb=1); the
    # f32 score block is only fb*S*S*4 (~2.3 MB), so a larger input budget is
    # safe here than for the short-row ViT kernel
    fb = _pick_block(b, s, packed, qkv.dtype.itemsize, budget=26 * 1024 * 1024)
    if fb is None:
        return _xla_packed_causal_fallback(qkv, num_heads, head_dim, padding_mask, scale)

    pad_b = (-b) % fb
    if pad_b:
        qkv = jnp.pad(qkv, ((0, pad_b), (0, 0), (0, 0)))
        padding_mask = jnp.pad(padding_mask, ((0, pad_b), (0, 0)), constant_values=1)
    bp = b + pad_b

    out = pl.pallas_call(
        functools.partial(
            _packed_causal_kernel, num_heads=num_heads, head_dim=head_dim, scale=scale
        ),
        grid=(bp // fb,),
        in_specs=[
            pl.BlockSpec((fb, s, packed), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (fb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, s, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * s * s * head_dim,
            bytes_accessed=(qkv.size + b * s * d) * qkv.dtype.itemsize,
            transcendentals=b * num_heads * s * s,
        ),
        interpret=interpret,
    )(qkv, padding_mask.astype(jnp.int32)[:, None, :])
    return out[:b] if pad_b else out


def _xla_packed_causal_fallback(qkv, num_heads, head_dim, padding_mask, scale):
    b, s, _ = qkv.shape
    r = qkv.reshape(b, s, 3, num_heads, head_dim)
    q, k, v = r[:, :, 0], r[:, :, 1], r[:, :, 2]
    from .attention import _xla_attention

    return _xla_attention(
        q, k, v,
        bias=None, padding_mask=padding_mask, causal=True, q_offset=0,
        scale=scale, scale_query_first=True, softmax_in_fp32=True,
    ).reshape(b, s, num_heads * head_dim)
