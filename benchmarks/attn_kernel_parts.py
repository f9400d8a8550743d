#!/usr/bin/env python
"""Split the fused ViT-attention kernel cost: QK matmul vs softmax vs PV.

All variants: grid (B/FB, H), blocks (FB,1,S,HD) over pre-transposed (B,H,S,D)
bf16 inputs, 39 chained ops in one jit. Variants toggle pieces of the kernel
body so the deltas attribute time to matmuls / softmax / casts.
"""

import sys, os, time, json, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAMES = int(os.environ.get("FRAMES", str(68 * 8)))
S, NH, HD = 257, 16, 88
N = int(os.environ.get("N", "39"))
REPS = int(os.environ.get("REPS", "3"))
FB = int(os.environ.get("FB", "4"))
SCALE = HD**-0.5


def make_kernel(mode):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[:, 0]
        k = k_ref[:, 0]
        v = v_ref[:, 0]
        if mode == "copy":
            o_ref[:, 0] = q
            return
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if mode == "qk_only":
            o_ref[:, 0] = s[:, :, :HD].astype(o_ref.dtype)
            return
        if mode == "full":
            p = jax.nn.softmax(s * SCALE, axis=-1).astype(q.dtype)
        elif mode == "softmax_bf16":
            p = jax.nn.softmax((s * SCALE).astype(jnp.bfloat16), axis=-1)
        elif mode == "exp_only":
            p = jnp.exp(s * SCALE - 8.0).astype(q.dtype)
        elif mode == "no_softmax":
            p = (s * SCALE).astype(q.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        o_ref[:, 0] = o.astype(o_ref.dtype)

    return kernel


def run(mode, fb=FB):
    spec = pl.BlockSpec((fb, 1, S, HD), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        make_kernel(mode),
        grid=(FRAMES // fb, NH),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((FRAMES, NH, S, HD), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
    )

    @jax.jit
    def chain(q, k, v):
        for _ in range(N):
            q = call(q, k, v)
        return jnp.sum(q.astype(jnp.float32))

    x = jax.random.normal(jax.random.PRNGKey(0), (FRAMES, NH, S, HD), jnp.bfloat16) * 0.1
    float(chain(x, x, x))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(chain(x, x, x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    flops = N * FRAMES * NH * 4 * S * S * HD
    for mode in ("copy", "qk_only", "no_softmax", "exp_only", "softmax_bf16", "full"):
        try:
            sec = run(mode)
            print(json.dumps({"mode": mode, "sec": round(sec, 4),
                              "ms_per_layer": round(1000 * sec / N, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"mode": mode, "error": str(e)[:160]}), flush=True)
    for fb in (2, 8):
        try:
            sec = run("full", fb)
            print(json.dumps({"mode": f"full fb={fb}", "sec": round(sec, 4),
                              "ms_per_layer": round(1000 * sec / N, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"mode": f"full fb={fb}", "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
