#!/usr/bin/env python
"""Kill the (B,S,H,D)<->(B,H,S,D) transposes around the fused ViT kernel.

Variants (39 chained ops in one jit, ViT hot shape 544x257x16x88 bf16):
  transpose-roundtrip   cost of swapaxes there+back alone (no attention)
  fused+transpose       current best: transpose -> BHSD kernel -> transpose
  fused-bshd-direct     kernel reads/writes (B,S,H,D) with block (FB,S,1,HD)
                        (strided DMA instead of materialized transposes)
  fused-bshd-headloop   kernel reads (FB,S,H,HD) contiguous blocks, loops heads
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
SCALE = HD**-0.5


# --- current best: BHSD kernel ---

def _bhsd_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[:, 0]
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * SCALE, axis=-1).astype(q.dtype)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[:, 0] = o.astype(o_ref.dtype)


def bhsd_call(fb=4):
    spec = pl.BlockSpec((fb, 1, S, HD), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bhsd_kernel, grid=(FRAMES // fb, NH),
        in_specs=[spec] * 3, out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((FRAMES, NH, S, HD), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )


# --- bshd-direct: blocks slice one head out of (B,S,H,D) ---

def _bshd_direct_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[:, :, 0]
    k = k_ref[:, :, 0]
    v = v_ref[:, :, 0]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * SCALE, axis=-1).astype(q.dtype)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[:, :, 0] = o.astype(o_ref.dtype)


def bshd_direct_call(fb=4):
    spec = pl.BlockSpec((fb, S, 1, HD), lambda i, j: (i, 0, j, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bshd_direct_kernel, grid=(FRAMES // fb, NH),
        in_specs=[spec] * 3, out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((FRAMES, S, NH, HD), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )


# --- bshd-headloop: contiguous (FB,S,H,HD) blocks, python loop over heads ---

def _bshd_headloop_kernel(q_ref, k_ref, v_ref, o_ref):
    for h in range(NH):
        q = q_ref[:, :, h]
        k = k_ref[:, :, h]
        v = v_ref[:, :, h]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * SCALE, axis=-1).astype(q.dtype)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[:, :, h] = o.astype(o_ref.dtype)


def bshd_headloop_call(fb=1):
    spec = pl.BlockSpec((fb, S, NH, HD), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bshd_headloop_kernel, grid=(FRAMES // fb,),
        in_specs=[spec] * 3, out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((FRAMES, S, NH, HD), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def bench(name, make_chain, x):
    try:
        fn = jax.jit(make_chain)
        float(fn(x))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(fn(x))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(json.dumps({"variant": name, "sec": round(med, 4),
                          "ms_per_layer": round(1000 * med / N, 2)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name, "error": str(e)[:160]}), flush=True)


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (FRAMES, S, NH, HD),
                          jnp.bfloat16) * 0.1

    def transpose_chain(x):
        for _ in range(N):
            t = jnp.swapaxes(x, 1, 2)
            x = jnp.swapaxes(t + 0.0, 1, 2)  # keep both materialized
        return jnp.sum(x.astype(jnp.float32))

    bench("transpose-roundtrip", transpose_chain, x)

    call = bhsd_call()

    def fused_t_chain(x):
        for _ in range(N):
            q = jnp.swapaxes(x, 1, 2)
            o = call(q, q, q)
            x = jnp.swapaxes(o, 1, 2)
        return jnp.sum(x.astype(jnp.float32))

    bench("fused+transpose fb=4", fused_t_chain, x)

    for fb in (2, 4, 8):
        dcall = bshd_direct_call(fb)

        def direct_chain(x, dcall=dcall):
            for _ in range(N):
                x = dcall(x, x, x)
            return jnp.sum(x.astype(jnp.float32))

        bench(f"bshd-direct fb={fb}", direct_chain, x)

    for fb in (1, 2):
        hcall = bshd_headloop_call(fb)

        def headloop_chain(x, hcall=hcall):
            for _ in range(N):
                x = hcall(x, x, x)
            return jnp.sum(x.astype(jnp.float32))

        bench(f"bshd-headloop fb={fb}", headloop_chain, x)


if __name__ == "__main__":
    main()
