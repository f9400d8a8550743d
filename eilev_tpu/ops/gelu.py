"""Gelu implementations + a global serving switch.

Default is HF-exact erf gelu (the parity bar). The OPT-IN "fast" variant
replaces erf with a tanh of a fitted even polynomial — measured ~6.5 ms/layer
cheaper on the EVA-ViT tower (the erf transcendental is VPU-bound;
benchmarks/gelu_variants.py) while agreeing with fp32-exact gelu at 99.3% of
all bf16 inputs (worst mismatch 2 ulp). Like int8 weights
(ops/quantization.py), it is a serving-mode knob, never a default: the north
star demands bf16-parity outputs (BASELINE.md).

Reference: HF ACT2FN["gelu"] (exact erf), used by Blip2's vision tower —
/root/reference/eilev/model/v2.py builds on Blip2VisionModel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_IMPL = "exact"

# atanh(erf(z))/z fitted as an even polynomial over [0, 4.3]; tanh of the odd
# product reproduces erf to 2.5e-6 abs -> gelu agrees with fp32-exact at
# 99.3% of bf16 inputs, worst mismatch 2 ulp (benchmarks/gelu_variants.py)
_TANH_ERF_COEFS = (
    1.1283739052635926, 0.10280524869696885, -0.00021829007797285102,
    -0.0006251723076862135, 9.580288272440067e-05, -7.889706044139844e-06,
    3.8227360114944883e-07, -1.0189506487675607e-08, 1.1516147638833664e-10,
)


def set_gelu_impl(impl: str) -> None:
    """'exact' (default, HF parity) | 'fast' (tanh-poly, serving-mode)."""
    global _IMPL
    assert impl in ("exact", "fast"), impl
    _IMPL = impl


def get_gelu_impl() -> str:
    return _IMPL


def gelu_fast(x: jax.Array) -> jax.Array:
    """tanh-of-fitted-polynomial erf gelu (see module docstring)."""
    xf = x.astype(jnp.float32)
    z = xf * 0.7071067811865476
    zc = jnp.clip(z, -4.3, 4.3)
    z2 = zc * zc
    p = _TANH_ERF_COEFS[-1]
    for c in reversed(_TANH_ERF_COEFS[:-1]):
        p = p * z2 + c
    t = jnp.tanh(zc * p)
    er = jnp.where(z > 4.3, 1.0, jnp.where(z < -4.3, -1.0, t))
    return (xf * 0.5 * (1.0 + er)).astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact-erf gelu, or the fast serving variant when opted in."""
    if _IMPL == "fast":
        return gelu_fast(x)
    return jax.nn.gelu(x, approximate=False)
