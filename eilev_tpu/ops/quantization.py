"""Weight-only int8 quantization for the decode-bound serving path.

Why: the OPT-2.7B decode step is HBM-bound on reading ~5 GB of bf16 matmul
weights every token (measured 7.7 ms/step at 654 GB/s on one v5e chip —
benchmarks/decode_variants.py). Storing those weights as int8 with per-output-
channel scales halves the stream: measured 4.5 ms/step for the same matmuls.
XLA fuses the int8->f32 dequant into the dot's weight read, so the bf16 weights
never materialize in HBM.

STRICTLY OPT-IN. The framework's north star is token-identical greedy output
vs the bf16 HF reference (BASELINE.md), and int8 rounding perturbs logits
(cosine similarity ~0.999+ but not bit-equal). Enable via
``OPTConfig/LlamaConfig(quantize_matmuls=True)`` +
:func:`quantize_lm_params` on the loaded checkpoint, or the ``--int8-lm``
flag on the serving CLIs.

Scope: the per-layer projection/FFN matmuls (q/k/v/out, fc1/fc2, gate/up/down).
Embeddings, the tied LM head, layer norms, and biases stay in model dtype —
the head is ~5% of the per-step traffic and shares storage with the input
embedding, and norm/bias numerics are load-bearing for parity debugging.

Reference equivalent: none (the reference serves fp16 HF eager — this is a
TPU-serving capability beyond parity; DeepSpeed ZeRO-2 in the reference is a
*training* memory feature, /root/reference/slurm-scripts/train/submit_train_v2.py).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# flax param-tree node names whose "kernel" gets quantized, per decoder family
OPT_QUANT_NAMES = frozenset({"qkv_proj", "out_proj", "fc1", "fc2"})
LLAMA_QUANT_NAMES = frozenset(
    {"qkv_proj", "o_proj", "gate_proj", "up_proj", "down_proj"}
)
QUANT_NAMES = OPT_QUANT_NAMES | LLAMA_QUANT_NAMES


def quantize_int8(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a (in, out) kernel.

    Returns (w8 int8 (in, out), scale float32 (out,)) with w ≈ w8 * scale.
    """
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return w8, scale


class Int8Dense(nn.Module):
    """Drop-in Dense with an int8 kernel + per-channel scale.

    The dot runs int8 weights against model-dtype activations with f32
    accumulation; the scale applies to the f32 accumulator before casting
    back, so the only quantization error is the weight rounding itself.

    ``w8a8_min_rows > 0`` (the ``w8a8_prefill`` serving mode): calls whose
    STATIC total row count reaches the threshold additionally quantize the
    activations per row and run int8 x int8 -> int32 on the 394-TOPS int8
    MXU path (2x the bf16 peak; measured 1.23x realistic at the flagship MLP
    shape incl. quant overhead — benchmarks/int8_mxu_probe.py). Because the
    dispatch is on the traced shape, one set of {w8, scale, bias} params
    serves both program forms: the LM PREFILL (thousands of rows, MXU-bound)
    takes the int8-MXU path while the DECODE step (batch-sized rows,
    HBM-bound) keeps the weight-only read where activation quant would only
    add cost. Extra error vs weight-only: per-token activation rounding.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    w8a8_min_rows: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w8 = self.param(
            "w8", nn.initializers.zeros, (x.shape[-1], self.features), jnp.int8
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        if self.w8a8_min_rows and rows >= self.w8a8_min_rows:
            x8, xs = quantize_act_rows(x)
            y32 = jax.lax.dot_general(
                x8,
                w8,
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (y32.astype(jnp.float32) * xs * scale).astype(self.dtype)
        else:
            y = jax.lax.dot_general(
                x,
                w8,
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = (y * scale).astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.dtype
            )
            y = y + bias
        return y


#: Row threshold for the w8a8_prefill dispatch: decode steps run batch-sized
#: (<= ~16) rows; prefill runs batch x seq (thousands). 64 splits them with
#: wide margin on both sides.
W8A8_PREFILL_MIN_ROWS = 64


def dense_cls(config) -> type:
    """nn.Dense, or Int8Dense when the config opts into quantized matmuls
    (with the W8A8 large-M dispatch when ``w8a8_prefill`` is also set)."""
    if not getattr(config, "quantize_matmuls", False):
        return nn.Dense
    if getattr(config, "w8a8_prefill", False):
        import functools

        return functools.partial(Int8Dense, w8a8_min_rows=W8A8_PREFILL_MIN_ROWS)
    return Int8Dense


def quantize_lm_params(params: Any, names: Optional[frozenset] = None) -> Any:
    """Transform a loaded bf16/f32 param tree for a ``quantize_matmuls`` model.

    Every dict node whose name is in ``names`` (default: both decoder
    families' projection/FFN modules) and that carries a "kernel" leaf becomes
    {w8, scale[, bias]}. Everything else passes through untouched, so the tree
    matches what ``model.init`` produces with the flag set.
    """
    if names is None:
        names = QUANT_NAMES

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, val in node.items():
            if key in names and isinstance(val, dict) and "kernel" in val:
                w8, scale = quantize_int8(jnp.asarray(val["kernel"]))
                q = {"w8": w8, "scale": scale}
                if "bias" in val:
                    q["bias"] = val["bias"]
                out[key] = q
            else:
                out[key] = walk(val)
        return out

    return walk(params)


# ---------------------------------------------------------------------------
# W8A8: int8 weights x dynamically-quantized int8 activations on the int8 MXU
# ---------------------------------------------------------------------------

# flax param-tree node names quantized in the vision tower (models/vision.py).
# The patch-embedding matmul, layer norms, and biases stay in model dtype.
VISION_QUANT_NAMES = frozenset({"qkv", "projection", "fc1", "fc2"})


def quantize_act_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row (per-token) dynamic int8 quantization of activations.

    x (..., K) -> (x8 int8 (..., K), scale f32 (..., 1)) with x ≈ x8 * scale.
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return x8, scale


class Int8W8A8Dense(nn.Module):
    """Dense on the v5e int8 MXU path: int8 kernel x int8 activations -> int32.

    Activations are quantized per row (per token) at trace time — two cheap
    elementwise passes — and the dot runs int8 x int8 with int32 accumulation,
    which XLA lowers to the 394-TOPS int8 MXU path (measured 300 TOPS pure /
    1.23x end-to-end vs bf16 at the ViT MLP shape incl. all quant overhead —
    benchmarks/int8_mxu_probe.py, docs/PERF.md). Dequant applies
    (row_scale x per-out-channel weight scale) to the int32 accumulator.

    Quantization error: weight rounding + per-token activation rounding
    (W8A8) — NOT bit-parity with bf16. Serving-mode only, like Int8Dense.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w8 = self.param(
            "w8", nn.initializers.zeros, (x.shape[-1], self.features), jnp.int8
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        x8, xs = quantize_act_rows(x)
        y32 = jax.lax.dot_general(
            x8,
            w8,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (y32.astype(jnp.float32) * xs * scale).astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.dtype
            )
            y = y + bias
        return y


def vision_dense_cls(config) -> type:
    """nn.Dense, or Int8W8A8Dense when the vision config opts in."""
    return (
        Int8W8A8Dense if getattr(config, "quantize_matmuls", False) else nn.Dense
    )


def quantize_vision_params(params: Any) -> Any:
    """Transform a loaded vision param subtree for ``quantize_matmuls``.

    Same walk as :func:`quantize_lm_params` (kernel -> {w8, scale[, bias]})
    over the vision tower's qkv/projection/fc1/fc2 nodes; weight scales are
    per output channel, activation scales are computed dynamically at run
    time by :class:`Int8W8A8Dense`.
    """
    return quantize_lm_params(params, names=VISION_QUANT_NAMES)


# flax param-tree node names quantized in the Q-Former (models/qformer.py):
# q/k/v projections, the attention output dense, and the FFN pair. The
# language_projection head and layer norms stay in model dtype.
QFORMER_QUANT_NAMES = frozenset(
    {"query", "key", "value", "dense", "intermediate", "output"}
)


def quantize_qformer_params(params: Any) -> Any:
    """Transform a loaded Q-Former param subtree for ``quantize_matmuls``.

    NOTE: the walk must run on the qformer SUBTREE only — the node names
    ("dense", "output") are generic BERT naming that would collide elsewhere.
    "output" names both the FFN's second dense (a kernel-bearing dict -> gets
    quantized) and wrapper modules (no "kernel" leaf -> recursed into), which
    the kernel-presence check disambiguates.
    """
    return quantize_lm_params(params, names=QFORMER_QUANT_NAMES)
