#!/usr/bin/env python
"""Fused LN+MLP Pallas kernel vs the XLA path at the ViT flagship shape.

The XLA path materializes the (M, 6144) fc1 activation in HBM twice and runs
erf as its own pass; the fused kernel (ops/fused_mlp.py) keeps the chain in
VMEM. Times LAYERS sequential MLP applications (data-dependent chain) inside
one jit with a scalar readback.
"""

import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

FRAMES = int(os.environ.get("FRAMES", str(68 * 8)))
S, D, F = 257, 1408, 6144
LAYERS = int(os.environ.get("LAYERS", "39"))
REPS = int(os.environ.get("REPS", "3"))


def main():
    from eilev_tpu.ops.fused_mlp import ln_mlp, _xla_fallback

    @jax.jit
    def make(key):
        ks = jax.random.split(key, 7)
        s = jnp.bfloat16(0.02)
        return (
            jax.random.normal(ks[0], (FRAMES, S, D), jnp.bfloat16),
            jnp.ones((D,), jnp.bfloat16),
            jnp.zeros((D,), jnp.bfloat16),
            jax.random.normal(ks[1], (D, F), jnp.bfloat16) * s,
            jax.random.normal(ks[2], (F,), jnp.bfloat16) * s,
            jax.random.normal(ks[3], (F, D), jnp.bfloat16) * s,
            jax.random.normal(ks[4], (D,), jnp.bfloat16) * s,
        )

    args = make(jax.random.PRNGKey(0))
    jax.block_until_ready(args)
    flops = LAYERS * 4 * FRAMES * S * D * F

    def tower(fn):
        def run(args):
            x, ln_s, ln_b, w1, b1, w2, b2 = args
            for _ in range(LAYERS):
                x = x + fn(x, ln_s, ln_b, w1, b1, w2, b2)
            return jnp.sum(x.astype(jnp.float32))
        return run

    for name, fn in [
        ("xla", lambda *a: _xla_fallback(*a, eps=1e-6)),
        ("fused", lambda *a: ln_mlp(*a, eps=1e-6)),
    ]:
        jfn = jax.jit(tower(fn))
        float(jfn(args))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(jfn(args))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(json.dumps({
            "mlp": name, "sec": round(med, 4),
            "ms_per_layer": round(1000 * med / LAYERS, 2),
            "tflops_per_sec": round(flops / med / 1e12, 1),
            "mfu_pct_197": round(100 * flops / med / 1e12 / 197, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
