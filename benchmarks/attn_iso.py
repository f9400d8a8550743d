#!/usr/bin/env python
"""Isolated attention-op timing at the ViT hot shape: where do the 568 ms go?

Times 39 back-to-back attention ops (data-dependent chain, one jit) for:
  xla                      einsum path
  fused+transpose          swapaxes -> kernel -> swapaxes (as used in tower)
  fused-pretransposed      inputs already (B,H,S,D): kernel cost alone
  fb sweep                 frames-per-program block size
"""

import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from attn_variants import fused_bhsd, attn_xla, NH, HD, S

FRAMES = int(os.environ.get("FRAMES", str(68 * 8)))
N = int(os.environ.get("N", "39"))
REPS = int(os.environ.get("REPS", "3"))


def chain(fn, x):
    # x: tuple of (q,k,v); re-feed output as q to keep a data dependence
    q, k, v = x
    for _ in range(N):
        q = fn(q, k, v)
    return jnp.sum(q.astype(jnp.float32))


def main():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (FRAMES, S, NH, HD), jnp.bfloat16) * 0.1
    qt = jnp.swapaxes(q, 1, 2)  # (B,H,S,D)

    flops = N * FRAMES * NH * 4 * S * S * HD
    variants = []

    variants.append(("xla", lambda: jax.jit(lambda q, k, v: chain(attn_xla, (q, k, v)))(q, q, q)))

    def fused_t(q, k, v):
        o = fused_bhsd(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), HD**-0.5)
        return jnp.swapaxes(o, 1, 2)

    variants.append(("fused+transpose fb=8", lambda: jax.jit(lambda q, k, v: chain(fused_t, (q, k, v)))(q, q, q)))

    for fb in (4, 8, 16, 32):
        def mk(fb):
            def f(q, k, v):
                return fused_bhsd(q, k, v, HD**-0.5, fb=fb)
            return f
        variants.append((f"fused-pre fb={fb}", lambda fb=fb: jax.jit(lambda q, k, v: chain(mk(fb), (q, k, v)))(qt, qt, qt)))

    for name, run in variants:
        try:
            float(run())
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(run())
                ts.append(time.perf_counter() - t0)
            med = float(np.median(ts))
            print(json.dumps({"variant": name, "sec": round(med, 4),
                              "attn_tflops_per_s": round(flops / med / 1e12, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
