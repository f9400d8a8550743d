"""Pallas TPU flash attention (forward) for the framework's hot shapes.

Replaces materialized (B, H, S, L) score tensors for:
  - EVA-ViT self-attention: S = L = 257 per frame, 136+ frames per 16-shot
    datapoint (the FLOPs bulk of the workload);
  - Q-Former cross-attention: 32 queries over T*257 = 2056 image tokens;
  - OPT prefill: ~700-1200 token causal self-attention against the KV cache.

Design (flash-attention-2 style, online softmax):
  - grid (batch, heads, q_blocks, kv_blocks); kv is the innermost (fastest)
    grid axis, so the fp32 running max / denominator / accumulator live in VMEM
    scratch across kv iterations of one q block;
  - head_dim is zero-padded to the 128-lane width by the host wrapper (zero key
    lanes add 0 to scores; zero value lanes produce zero output columns that are
    sliced off) - the flagship head dims are 88 (ViT), 80 (OPT), 64 (Q-Former);
  - sequence lengths are padded to the block size; in-kernel masks (static
    iota vs. the true length) kill padded keys, and padded query rows produce
    garbage that the wrapper slices away;
  - causal masking with a query-position offset (queries appended at the end of
    a longer KV axis, i.e. prefill into a preallocated cache) is computed
    in-kernel from iotas - the (S, L) causal bias array is never materialized;
  - optional additive bias ref (broadcast over batch: (H, S, L) - T5's relative
    position bias) and optional (B, L) padding mask;
  - fully-masked kv blocks ahead of the causal frontier are skipped with
    @pl.when (they still iterate but do no FLOPs).

Scores accumulate in fp32 on the MXU (preferred_element_type), softmax in fp32,
output cast back to the input dtype - matching the XLA reference path in
ops/attention.py at bf16-serving tolerance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_KV = 128
NEG_INF = float(jnp.finfo(jnp.float32).min)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_kernel(
    q_ref,  # (1, 1, BQ, D)
    k_ref,  # (1, 1, BK, D)
    v_ref,  # (1, 1, BK, D)
    mask_ref,  # (1, BK) int32 or None
    bias_ref,  # (1, BQ, BK) fp32 or None
    out_ref,  # (1, 1, BQ, D)
    m_scr,  # (BQ, 1) fp32
    l_scr,  # (BQ, 1) fp32
    acc_scr,  # (BQ, D) fp32
    *,
    causal: bool,
    q_offset: int,
    scale: Optional[float],
    scale_query_first: bool,
    block_q: int,
    block_kv: int,
    kv_len: int,
    num_kv_blocks: int,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = qi * block_q + q_offset  # absolute position of this q block
    k_start = ki * block_kv

    def _compute():
        q = q_ref[0, 0]
        if scale is not None and scale_query_first:
            q = q * jnp.asarray(scale, q.dtype)
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK) fp32
        if scale is not None and not scale_query_first:
            s = s * scale
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)

        # key-padding + causal masks
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1) + k_start
        masked = k_pos >= kv_len
        if mask_ref is not None:
            masked = masked | (mask_ref[0][None, :] == 0)
        if causal:
            q_pos = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0) + q_start
            )
            masked = masked | (k_pos > q_pos)
        s = jnp.where(masked, NEG_INF, s)

        m_prev = m_scr[:]
        l_prev = l_scr[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # guard fully-masked rows: exp(NEG_INF - NEG_INF) would be exp(0)=1
        p = jnp.exp(s - jnp.where(m_new == NEG_INF, 0.0, m_new))
        p = jnp.where(masked, 0.0, p)
        alpha = jnp.exp(m_prev - jnp.where(m_new == NEG_INF, 0.0, m_new))
        alpha = jnp.where(m_prev == NEG_INF, 0.0, alpha)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new
        l_scr[:] = l_new

    if causal:
        # skip kv blocks fully ahead of the causal frontier (no FLOPs for the
        # upper triangle at block granularity)
        pl.when(k_start <= q_start + block_q - 1)(_compute)
    else:
        _compute()

    @pl.when(ki == num_kv_blocks - 1)
    def _finalize():
        denom = l_scr[:]
        denom = jnp.where(denom == 0.0, 1.0, denom)  # fully-masked rows -> 0 out
        out_ref[0, 0] = (acc_scr[:] / denom).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal",
        "q_offset",
        "scale",
        "scale_query_first",
        "block_q",
        "block_kv",
        "interpret",
    ),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    padding_mask: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    q_offset: int = 0,
    scale: Optional[float] = None,
    scale_query_first: bool = False,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention forward.

    Args:
      q: (B, S, H, D); k, v: (B, L, H, D).
      padding_mask: optional (B, L) 0/1 keep-mask over keys.
      bias: optional (H, S, L) additive bias, broadcast over batch (T5 relpos).
      causal: causal masking with ``q_offset`` = absolute position of query 0
        on the key axis.
      scale / scale_query_first: as in ops.attention.dot_product_attention.

    Returns (B, S, H, D) in q.dtype.
    """
    b, s, h, d = q.shape
    l = k.shape[1]
    orig_s, orig_d = s, d

    d_pad = _round_up(d, LANES)
    s_pad = _round_up(s, block_q)
    l_pad = _round_up(l, block_kv)

    def pad(x, target_len, axis_len_idx):
        pads = [(0, 0)] * x.ndim
        pads[1] = (0, target_len - x.shape[1])
        pads[3] = (0, d_pad - d)
        return jnp.pad(x, pads)

    # (B, H, S, D) layout for clean per-(b, h) blocking
    qt = jnp.swapaxes(pad(q, s_pad, 1), 1, 2)
    kt = jnp.swapaxes(pad(k, l_pad, 1), 1, 2)
    vt = jnp.swapaxes(pad(v, l_pad, 1), 1, 2)

    num_q_blocks = s_pad // block_q
    num_kv_blocks = l_pad // block_kv
    grid = (b, h, num_q_blocks, num_kv_blocks)

    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, d_pad), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, block_kv, d_pad), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, block_kv, d_pad), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [qt, kt, vt]

    if padding_mask is not None:
        pm = jnp.pad(padding_mask.astype(jnp.int32), ((0, 0), (0, l_pad - l)))
        in_specs.append(
            pl.BlockSpec(
                (1, block_kv), lambda bi, hi, qi, ki: (bi, ki), memory_space=pltpu.VMEM
            )
        )
        args.append(pm)
    if bias is not None:
        bias_p = jnp.pad(
            bias.astype(jnp.float32),
            ((0, 0), (0, s_pad - s), (0, l_pad - l)),
        )
        in_specs.append(
            pl.BlockSpec(
                (1, block_q, block_kv),
                lambda bi, hi, qi, ki: (hi, qi, ki),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(bias_p)

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        q_offset=q_offset,
        scale=scale,
        scale_query_first=scale_query_first,
        block_q=block_q,
        block_kv=block_kv,
        kv_len=l,
        num_kv_blocks=num_kv_blocks,
    )
    if padding_mask is None and bias is None:
        wrapped = lambda q_r, k_r, v_r, o_r, m_s, l_s, a_s: kernel(  # noqa: E731
            q_r, k_r, v_r, None, None, o_r, m_s, l_s, a_s
        )
    elif padding_mask is not None and bias is None:
        wrapped = lambda q_r, k_r, v_r, p_r, o_r, m_s, l_s, a_s: kernel(  # noqa: E731
            q_r, k_r, v_r, p_r, None, o_r, m_s, l_s, a_s
        )
    elif padding_mask is None and bias is not None:
        wrapped = lambda q_r, k_r, v_r, b_r, o_r, m_s, l_s, a_s: kernel(  # noqa: E731
            q_r, k_r, v_r, None, b_r, o_r, m_s, l_s, a_s
        )
    else:
        wrapped = lambda q_r, k_r, v_r, p_r, b_r, o_r, m_s, l_s, a_s: kernel(  # noqa: E731
            q_r, k_r, v_r, p_r, b_r, o_r, m_s, l_s, a_s
        )

    out = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d_pad), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * l * d_pad,
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=b * h * s * l,
        ),
        interpret=interpret,
    )(*args)

    # back to (B, S, H, D), dropping padding
    return jnp.swapaxes(out, 1, 2)[:, :orig_s, :, :orig_d]
