"""Fused LayerNorm -> fc1 -> exact-erf gelu -> fc2 Pallas kernel (ViT MLP).

STATUS: EXPERIMENTAL — measured SLOWER than XLA, intentionally NOT
dispatched from the model. On v5e at the EVA-ViT flagship shape (544 frames
x 257 x 1408, FFN 6144; benchmarks/mlp_variants.py):

    xla    34.6 ms/layer  (71% MFU standalone)
    fused  38.8 ms/layer  (monolithic GEMM->gelu->GEMM chain in VMEM)
    fused  41.2 ms/layer  (F-blocked to invite MXU/VPU overlap — worse)

The hypothesis was that XLA's separate library GEMMs pay ~3.4 GB/layer of
HBM round trips on the fc1 activation plus a serialized erf pass, and a
VMEM-resident chain would win them back. The measurement says no: XLA's
GEMM library efficiency (140 TFLOP/s at these shapes) exceeds what the
hand-written dot chains reach inside the kernel (117-125 TFLOP/s), and
Mosaic does not overlap the VPU gelu with MXU work across the chain, so
the saved HBM traffic is outweighed. Kept (a) as the documented retirement
of this optimization path, and (b) because the kernel wins elsewhere in
spirit: the same whole-row-in-VMEM pattern DOES win for attention, where
XLA materializes fp32 scores (ops/fused_attention.py, 3x).

Numerics match the flax path (LayerNorm(use_fast_variance=False) ->
Dense -> gelu(approximate=False) -> Dense) to bf16 rounding; erf inside the
kernel uses Abramowitz-Stegun 7.1.26 (Mosaic has no erf/erfc lowering);
parity-tested in tests/models/test_fused_mlp.py. Reference model: HF
Blip2VisionModel MLP (/root/reference/eilev/model/v2.py vision tower).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 110 * 1024 * 1024


def _gelu_erf_as26(x: jax.Array) -> jax.Array:
    """Exact-erf gelu with erf by Abramowitz-Stegun 7.1.26 (|erf error| <=
    1.5e-7 in fp32 — an order below bf16 resolution, so the cast-to-bf16
    output is faithful to true erf). Needed because Mosaic has no erf/erfc
    lowering; benchmarks/gelu_variants.py verified bf16 agreement."""
    z = x * 0.7071067811865476
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    erf_abs = 1.0 - poly * jnp.exp(-a * a)
    erf = jnp.sign(z) * erf_abs
    return x * 0.5 * (1.0 + erf)


def _kernel(
    x_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    *, eps: float, f_block: int,
):
    x = x_ref[:].astype(jnp.float32)  # (fb, S, D)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + eps)
    h = h * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)
    h = h.astype(x_ref.dtype)
    f = w1_ref.shape[1]
    # FFN blocked over F: each block's fc1-GEMM / gelu / fc2-GEMM chain is
    # independent of the others except for the final accumulate, so Mosaic
    # can overlap block j's VPU gelu with block j+1's MXU matmul instead of
    # serializing one giant GEMM -> gelu -> GEMM chain
    o = None
    for j in range(f // f_block):
        lo = j * f_block
        aj = jax.lax.dot_general(
            h, w1_ref[:, lo : lo + f_block], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        aj = aj + b1_ref[lo : lo + f_block].astype(jnp.float32)
        aj = _gelu_erf_as26(aj).astype(x_ref.dtype)
        oj = jax.lax.dot_general(
            aj, w2_ref[lo : lo + f_block, :], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = oj if o is None else o + oj
    o = o + b2_ref[:].astype(jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def _pick_fb(b: int, s: int, d: int, f: int, itemsize: int) -> Optional[int]:
    # fp32 fc1 activation block is the VMEM hog: fb * s * f * 4 bytes,
    # double-buffered by the pipeline; keep it under ~26 MB
    for fb in (4, 2, 1):
        if fb * s * f * 4 <= 26 * 1024 * 1024 and b % fb == 0:
            return fb
    return None


def ln_mlp(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """fc2(gelu(fc1(layernorm(x)))) in one Pallas program.

    x: (B, S, D); w1: (D, F); w2: (F, D); returns (B, S, D) in x.dtype.
    Falls back to the unfused XLA ops when the shape doesn't block cleanly
    (callers on CPU use the flax path instead — see models/vision.py).
    """
    b, s, d = x.shape
    f = w1.shape[1]
    fb = _pick_fb(b, s, d, f, x.dtype.itemsize)
    if fb is None:
        return _xla_fallback(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps)

    f_block = min(f, int(__import__("os").environ.get("EILEV_MLP_FBLOCK", "1024")))
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, f_block=f_block),
        grid=(b // fb,),
        in_specs=[
            pl.BlockSpec((fb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((fb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * d * f,
            bytes_accessed=(2 * b * s * d + d * f * 2) * x.dtype.itemsize,
            transcendentals=b * s * f,
        ),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1, b1, w2, b2)


def _xla_fallback(x, ln_scale, ln_bias, w1, b1, w2, b2, *, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = (h * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)).astype(x.dtype)
    a = (
        jax.lax.dot_general(h, w1, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32)
    )
    a = jax.nn.gelu(a, approximate=False).astype(x.dtype)
    o = (
        jax.lax.dot_general(a, w2, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        + b2.astype(jnp.float32)
    )
    return o.astype(x.dtype)
