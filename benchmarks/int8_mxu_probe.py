#!/usr/bin/env python
"""Does XLA:TPU reach the v5e int8 MXU (394 TOPS, 2x bf16) from lax.dot_general?

The vision tower is ~83% of the headline step and MXU-bound (65.4% MFU bf16,
docs/PERF.md), so W8A8 vision matmuls are the one serving lever with >1.2x
headroom left — IF int8 x int8 -> int32 dots actually run at the int8 peak
AND the dynamic activation-quant overhead (absmax + round per row, two extra
elementwise passes) doesn't eat the win. Times LAYERS chained MLP pairs
(fc1 D->F, fc2 F->D — the ViT MLP, 95%-of-FLOPs shape) inside one jit:

  bf16        x @ w1 -> gelu-ish -> @ w2            (baseline, matches tower)
  int8-pure   pre-quantized x8 @ w1_8 -> int32 -> requant -> @ w2_8
              (upper bound: is the int8 MXU path reachable at all?)
  w8a8-dyn    bf16 x -> per-row dynamic quant -> int8 GEMM -> dequant+gelu
              -> quant -> int8 GEMM -> dequant + residual   (realistic mode)

No reference equivalent (the reference serves fp16 eager); this prices a
TPU-serving capability beyond parity.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FRAMES = int(os.environ.get("FRAMES", str(68 * 8)))
S, D, F = 257, 1408, 6144
M = FRAMES * S
LAYERS = int(os.environ.get("LAYERS", "12"))
REPS = int(os.environ.get("REPS", "3"))


def quant_rows(x):
    """Per-row symmetric int8: x (M, K) bf16 -> (x8 int8, scale f32 (M, 1))."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return x8, scale


def int8_dot(x8, w8):
    return jax.lax.dot_general(
        x8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def main():
    @jax.jit
    def make(key):
        ks = jax.random.split(key, 3)
        s = jnp.bfloat16(0.02)
        x = jax.random.normal(ks[0], (M, D), jnp.bfloat16)
        w1 = jax.random.normal(ks[1], (D, F), jnp.bfloat16) * s
        w2 = jax.random.normal(ks[2], (F, D), jnp.bfloat16) * s
        w1_8, w1_s = quant_rows(w1.T)  # per-out-channel == per-row of w.T
        w2_8, w2_s = quant_rows(w2.T)
        x8, _ = quant_rows(x)
        return x, w1, w2, x8, w1_8.T, w1_s.T, w2_8.T, w2_s.T

    args = make(jax.random.PRNGKey(0))
    jax.block_until_ready(args)
    flops = LAYERS * 4 * M * D * F

    def bf16_chain(args):
        x, w1, w2 = args[0], args[1], args[2]
        for _ in range(LAYERS):
            h = jnp.dot(x, w1)
            h = (h * jax.nn.sigmoid(1.702 * h.astype(jnp.float32)).astype(h.dtype))
            x = x + jnp.dot(h, w2)
        return jnp.sum(x.astype(jnp.float32))

    def int8_pure_chain(args):
        x8, w1_8, w2_8 = args[3], args[4], args[6]
        for _ in range(LAYERS):
            h32 = int8_dot(x8, w1_8)  # (M, F) int32
            h8 = jnp.clip(h32 >> 8, -127, 127).astype(jnp.int8)  # cheap requant
            o32 = int8_dot(h8, w2_8)  # (M, D) int32
            x8 = jnp.clip(o32 >> 8, -127, 127).astype(jnp.int8)
        return jnp.sum(x8.astype(jnp.float32))

    def w8a8_dyn_chain(args):
        x, w1_8, w1_s, w2_8, w2_s = args[0], args[4], args[5], args[6], args[7]
        for _ in range(LAYERS):
            x8, xs = quant_rows(x)
            h32 = int8_dot(x8, w1_8)
            h = (h32.astype(jnp.float32) * xs * w1_s).astype(jnp.bfloat16)
            h = (h * jax.nn.sigmoid(1.702 * h.astype(jnp.float32)).astype(h.dtype))
            h8, hs = quant_rows(h)
            o32 = int8_dot(h8, w2_8)
            x = x + (o32.astype(jnp.float32) * hs * w2_s).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    for name, fn in [
        ("bf16", bf16_chain),
        ("int8-pure", int8_pure_chain),
        ("w8a8-dyn", w8a8_dyn_chain),
    ]:
        jfn = jax.jit(fn)
        float(jfn(args))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(jfn(args))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(json.dumps({
            "variant": name, "sec": round(med, 4),
            "ms_per_layer": round(1000 * med / LAYERS, 2),
            "tops_per_sec": round(flops / med / 1e12, 1),
            "pct_of_bf16_peak_197": round(100 * flops / med / 1e12 / 197, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
