"""Gelu implementations + a global serving switch.

Default is HF-exact erf gelu (the parity bar). The OPT-IN "fast" variant is
the tanh approximation: measured 66.1% -> 74.2% tower MFU on the EVA-ViT
flagship shape (the exact erf is VPU-transcendental-bound, ~6 ms/layer;
benchmarks/gelu_variants.py) while agreeing with fp32-exact gelu at 98.9% of
all bf16 inputs (bf16's 8-bit mantissa absorbs the tanh approximation error;
max deviation 0.016 absolute / ~5% relative near the curve's knee). A fitted
tanh-polynomial variant with 99.3% agreement was tried and RETIRED: its poly
evaluation costs as much as XLA's erf (2.23 vs 2.17 s/tower — no win).

Like int8 weights (ops/quantization.py), this is a serving-mode knob, never
a default: the north star demands bf16-parity outputs (BASELINE.md).

Reference: HF ACT2FN["gelu"] (exact erf), used by Blip2's vision tower —
/root/reference/eilev/model/v2.py builds on Blip2VisionModel.
"""

from __future__ import annotations

import jax

_IMPL = "exact"


def set_gelu_impl(impl: str) -> None:
    """'exact' (default, HF parity) | 'fast' (tanh, serving-mode).

    IMPORTANT: the switch is read at TRACE time, so it must be set BEFORE the
    first compile of any program that uses gelu. An already-jitted program
    (e.g. a warmed-up ``generate``/``full_step``) keeps whatever impl was
    active when it was traced; switching later silently has no effect on it.
    The serving CLIs set this before building the model for exactly this
    reason (scripts/generate_narration_texts.py --fast_gelu).
    """
    global _IMPL
    assert impl in ("exact", "fast"), impl
    _IMPL = impl


def get_gelu_impl() -> str:
    return _IMPL


def gelu_fast(x: jax.Array) -> jax.Array:
    """tanh-approximation gelu (see module docstring for the faithfulness
    measurement)."""
    return jax.nn.gelu(x, approximate=True)


def gelu(x: jax.Array) -> jax.Array:
    """Exact-erf gelu, or the fast serving variant when opted in."""
    if _IMPL == "fast":
        return gelu_fast(x)
    return jax.nn.gelu(x, approximate=False)
