#!/usr/bin/env python
"""Attention formulations at the EVA-ViT hot shape (544 x 16h x 257 x 88).

The XLA einsum path materializes ~2.3 GB of fp32 scores per layer -> HBM bound
(~850 ms of the 2.86 s tower, vs ~40 ms of MXU FLOPs).  This times a 39-layer
tower (amortizes the ~30 ms dispatch overhead) for each candidate:

  xla            einsum scores -> softmax -> einsum (ops/attention.py default)
  repo-flash     ops/flash_attention.py (loses: host-side transpose+pad copies)
  jax-flash      jax.experimental.pallas.ops.tpu.flash_attention (canonical)
  fused-bhsd     new kernel: grid (B/F, H), full S in VMEM, inputs (B,H,S,D)
  fused-bshd     new kernel: grid (B/F,), all heads per program, inputs (B,S,H,D)

Run: python benchmarks/attn_variants.py
"""

import sys, os, time, json, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAMES = int(os.environ.get("FRAMES", str(68 * 8)))
S, D, F, NH = 257, 1408, 6144, 16
HD = D // NH
LAYERS = int(os.environ.get("LAYERS", "39"))
REPS = int(os.environ.get("REPS", "3"))
FB = int(os.environ.get("FB", "8"))  # frames per program


# ---------------- fused kernels ----------------

def _fused_bhsd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    # blocks: (FB, 1, S, HD); one head, FB frames, full sequence in VMEM
    q = q_ref[:, 0]
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (FB, S, S)
    p = jax.nn.softmax(s * scale, axis=-1).astype(q.dtype)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[:, 0] = o.astype(o_ref.dtype)


def fused_bhsd(q, k, v, scale, fb=FB):
    # q,k,v: (B, H, S, HD)
    b, h, s, hd = q.shape
    grid = (b // fb, h)
    spec = pl.BlockSpec(
        (fb, 1, s, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_fused_bhsd_kernel, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * hd,
            bytes_accessed=4 * b * h * s * hd * 2,
            transcendentals=b * h * s * s,
        ),
    )(q, k, v)


def _fused_bshd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    # blocks: (FB, S, H, HD); in-kernel transpose to (FB*H, S, HD) since Mosaic
    # matmul supports a single batch dim
    fb, s, h, hd = q_ref.shape

    def bh(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(fb * h, s, hd)

    q = bh(q_ref[:])
    k = bh(k_ref[:])
    v = bh(v_ref[:])
    sc = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (FB*H, S, S)
    p = jax.nn.softmax(sc * scale, axis=-1).astype(q.dtype)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (FB*H, S, HD)
    o = o.reshape(fb, h, s, hd)
    o_ref[:] = jnp.transpose(o, (0, 2, 1, 3)).astype(o_ref.dtype)


def fused_bshd(q, k, v, scale, fb=1):
    b, s, h, hd = q.shape
    grid = (b // fb,)
    spec = pl.BlockSpec(
        (fb, s, h, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_fused_bshd_kernel, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * hd,
            bytes_accessed=4 * b * h * s * hd * 2,
            transcendentals=b * h * s * s,
        ),
    )(q, k, v)


# ---------------- tower harness ----------------

def make_weights(key):
    ks = jax.random.split(key, 6)
    s = 0.02
    return {
        "qkv": jax.random.normal(ks[0], (D, 3 * D), jnp.bfloat16) * s,
        "proj": jax.random.normal(ks[1], (D, D), jnp.bfloat16) * s,
        "fc1": jax.random.normal(ks[2], (D, F), jnp.bfloat16) * s,
        "fc2": jax.random.normal(ks[3], (F, D), jnp.bfloat16) * s,
        "ln1": jnp.ones((D,), jnp.bfloat16),
        "ln2": jnp.ones((D,), jnp.bfloat16),
    }


def layer(x, w, attn_fn):
    def layernorm(h, scale):
        hf = h.astype(jnp.float32)
        mu = hf.mean(-1, keepdims=True)
        var = jnp.square(hf - mu).mean(-1, keepdims=True)
        return ((hf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(h.dtype) * scale

    b, s, d = x.shape
    res = x
    h = layernorm(x, w["ln1"])
    qkv = (h @ w["qkv"]).reshape(b, s, 3, NH, HD)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    out = attn_fn(q, k, v).reshape(b, s, d)
    x = res + out @ w["proj"]
    res = x
    h = layernorm(x, w["ln2"])
    h = jax.nn.gelu(h @ w["fc1"], approximate=False)
    return res + h @ w["fc2"]


def tower(x, w, attn_fn):
    for _ in range(LAYERS):
        x = layer(x, w, attn_fn)
    return jnp.sum(x.astype(jnp.float32))


def attn_xla(q, k, v):
    scores = jnp.einsum("bshd,blhd->bhsl", q, k) * (HD**-0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhsl,blhd->bshd", probs, v)


def attn_repo_flash(q, k, v):
    from eilev_tpu.ops.flash_attention import flash_attention

    return flash_attention(q, k, v, scale=HD**-0.5)


def attn_jax_flash(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jf, BlockSizes,
    )
    # canonical kernel wants (B, H, S, D)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    o = jf(qt, kt, vt, sm_scale=HD**-0.5, causal=False)
    return jnp.swapaxes(o, 1, 2)


def attn_fused_bhsd(q, k, v):
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    o = fused_bhsd(qt, kt, vt, HD**-0.5)
    return jnp.swapaxes(o, 1, 2)


def attn_fused_bshd(q, k, v):
    return fused_bshd(q, k, v, HD**-0.5)


def main():
    w = make_weights(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (FRAMES, S, D), jnp.bfloat16) * 0.1

    gemm_flops = LAYERS * FRAMES * (8 * S * D * D + 4 * S * D * F)
    attn_flops = LAYERS * FRAMES * 4 * S * S * D

    # numerics check vs xla on a small slice
    qs = jax.random.normal(jax.random.PRNGKey(2), (8, S, NH, HD), jnp.bfloat16)
    ref = attn_xla(qs, qs, qs)
    for name, fn in [("fused-bhsd", attn_fused_bhsd), ("fused-bshd", attn_fused_bshd)]:
        got = jax.jit(fn)(qs, qs, qs)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(json.dumps({"check": name, "max_abs_err_vs_xla": round(err, 5)}), flush=True)

    variants = [
        ("xla", attn_xla),
        ("repo-flash", attn_repo_flash),
        ("jax-flash", attn_jax_flash),
        ("fused-bhsd", attn_fused_bhsd),
        ("fused-bshd", attn_fused_bshd),
    ]
    only = os.environ.get("ONLY")
    for name, attn in variants:
        if only and name != only:
            continue
        try:
            fn = jax.jit(lambda x, w, attn=attn: tower(x, w, attn))
            float(fn(x, w))
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(fn(x, w))
                ts.append(time.perf_counter() - t0)
            med = float(np.median(ts))
            fl = gemm_flops + attn_flops
            print(json.dumps({"variant": name, "sec": round(med, 4),
                              "mfu_pct_197": round(100 * fl / med / 1e12 / 197, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
