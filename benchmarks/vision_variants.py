#!/usr/bin/env python
"""Ablate the EVA-ViT tower's non-GEMM costs on one chip.

Functional re-implementation of the 39-layer tower at the flagship shape
(544 frames x 257 x 1408) with switches: attention impl (xla | flash | none),
gelu (erf | tanh | none), layernorm (exact | fast | none). Each variant is one
jitted program returning a scalar (4-byte readback; axon's block_until_ready
is a no-op). Drives the round-2 vision MFU work (docs/PERF.md).
"""

import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

FRAMES = int(os.environ.get("FRAMES", str(68 * 8)))
S, D, F, NH = 257, 1408, 6144, 16
HD = D // NH
LAYERS = int(os.environ.get("LAYERS", "39"))
REPS = int(os.environ.get("REPS", "3"))


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


def layer(x, w, *, attn, gelu, ln):
    def layernorm(h, scale):
        if ln == "none":
            return h
        hf = h.astype(jnp.float32)
        mu = hf.mean(-1, keepdims=True)
        if ln == "fast":
            var = (hf * hf).mean(-1, keepdims=True) - mu * mu
        else:
            var = jnp.square(hf - mu).mean(-1, keepdims=True)
        return ((hf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(h.dtype) * scale

    b, s, d = x.shape
    res = x
    h = layernorm(x, w["ln1"])
    qkv = (h @ w["qkv"]).reshape(b, s, 3, NH, HD)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if attn == "none":
        out = q.reshape(b, s, d)
    elif attn == "flash":
        from eilev_tpu.ops.flash_attention import flash_attention

        out = flash_attention(q, k, v, scale=HD**-0.5).reshape(b, s, d)
    else:
        scores = jnp.einsum("bshd,blhd->bhsl", q, k) * (HD**-0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhsl,blhd->bshd", probs, v).reshape(b, s, d)
    x = res + out @ w["proj"]
    res = x
    h = layernorm(x, w["ln2"])
    h = h @ w["fc1"]
    if gelu == "erf":
        h = jax.nn.gelu(h, approximate=False)
    elif gelu == "tanh":
        h = jax.nn.gelu(h, approximate=True)
    h = h @ w["fc2"]
    return res + h


def tower(x, w, **kw):
    for _ in range(LAYERS):
        x = layer(x, w, **kw)
    return jnp.sum(x.astype(jnp.float32))


def main():
    w = make_weights(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (FRAMES, S, D), jnp.bfloat16) * 0.1

    gemm_flops = LAYERS * FRAMES * (8 * S * D * D + 4 * S * D * F)
    attn_flops = LAYERS * FRAMES * 4 * S * S * D

    variants = [
        ("baseline xla/erf/exact", dict(attn="xla", gelu="erf", ln="exact")),
        ("flash attention", dict(attn="flash", gelu="erf", ln="exact")),
        ("no attention", dict(attn="none", gelu="erf", ln="exact")),
        ("no gelu", dict(attn="xla", gelu="none", ln="exact")),
        ("tanh gelu", dict(attn="xla", gelu="tanh", ln="exact")),
        ("no layernorm", dict(attn="xla", gelu="erf", ln="none")),
        ("fast layernorm", dict(attn="xla", gelu="erf", ln="fast")),
        ("everything off", dict(attn="none", gelu="none", ln="none")),
    ]
    for name, kw in variants:
        fn = jax.jit(lambda x, w, kw=kw: tower(x, w, **kw))
        float(fn(x, w))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(fn(x, w))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        fl = gemm_flops + (attn_flops if kw["attn"] != "none" else 0)
        print(json.dumps({"variant": name, "sec": round(med, 4),
                          "mfu_pct_197": round(100 * fl / med / 1e12 / 197, 1)}), flush=True)


if __name__ == "__main__":
    main()
