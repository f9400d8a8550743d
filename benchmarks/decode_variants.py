#!/usr/bin/env python
"""Decompose the OPT decode step cost on one chip.

The flagship decode step (batch 4, cache ~800) measured ~23 ms vs a ~8 ms
weight+cache HBM-read bound. This times each ingredient as a 32-iteration
fori_loop inside ONE jit (scalar readback), so per-call tunnel overhead (~33 ms)
amortizes away. Drives the round-2 decode work (docs/PERF.md).
"""

import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("B", "4"))
D, FFN, NH, HD, L = 2560, 10240, 32, 80, 32
VOCAB = 50272
CACHE_LEN = int(os.environ.get("CACHE_LEN", "800"))
STEPS = 32
REPS = int(os.environ.get("REPS", "3"))


def timeit(name, fn, *args, bytes_per_step=None):
    jfn = jax.jit(fn)
    float(jfn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    line = {"variant": name, "ms_per_step": round(1000 * med / STEPS, 2)}
    if bytes_per_step:
        line["gb_per_s"] = round(bytes_per_step / (med / STEPS) / 1e9, 0)
    print(json.dumps(line), flush=True)
    return med



def main():
    # generate ALL buffers inside one jitted program (eager per-array creation
    # materializes fp32 intermediates host-side on the axon platform - a ~30 GB
    # RSS and a multi-minute tunnel stall)
    @jax.jit
    def make_all(key):
        ks = jax.random.split(key, 8)
        s = jnp.bfloat16(0.02)
        return (
            jax.random.normal(ks[0], (L, D, 3 * D), jnp.bfloat16) * s,
            jax.random.normal(ks[1], (L, D, D), jnp.bfloat16) * s,
            jax.random.normal(ks[2], (L, D, FFN), jnp.bfloat16) * s,
            jax.random.normal(ks[3], (L, FFN, D), jnp.bfloat16) * s,
            jax.random.normal(ks[4], (D, VOCAB), jnp.bfloat16) * s,
            jax.random.normal(ks[5], (B, D), jnp.bfloat16),
            jax.random.normal(ks[6], (L, B, CACHE_LEN, NH, HD), jnp.bfloat16),
            jax.random.normal(ks[7], (L, B, CACHE_LEN, NH, HD), jnp.bfloat16),
        )

    W = make_all(jax.random.PRNGKey(0))
    jax.block_until_ready(W)
    wqkv, wo, w1, w2, whead, x0, ck, cv = W

    layer_bytes = 2 * (wqkv.size // L + wo.size // L + w1.size // L + w2.size // L)
    head_bytes = 2 * whead.size
    cache_bytes = 2 * (ck.size + cv.size) // L * L  # read k+v fully

    # weights pass as jit ARGUMENTS (closure capture would bake 5 GB of
    # constants into the lowered HLO and stall compilation for minutes)

    # 1. pure weight streaming: all layer matmuls, no attention
    def weights_only(W):
        wqkv, wo, w1, w2, whead, x0, ck, cv = W
        def step(_, x):
            def body(i, h):
                qkv = h @ wqkv[i]
                h = qkv[:, :D] @ wo[i]
                h = (h @ w1[i]) @ w2[i]
                return h
            return jax.lax.fori_loop(0, L, body, x)
        out = jax.lax.fori_loop(0, STEPS, step, x0)
        return jnp.sum(out.astype(jnp.float32))

    timeit("weights only (qkv+o+ffn x32L)", weights_only, W,
           bytes_per_step=layer_bytes * L)

    # 2. + lm head
    def weights_head(W):
        wqkv, wo, w1, w2, whead, x0, ck, cv = W
        def step(_, x):
            def body(i, h):
                qkv = h @ wqkv[i]
                h = qkv[:, :D] @ wo[i]
                h = (h @ w1[i]) @ w2[i]
                return h
            h = jax.lax.fori_loop(0, L, body, x)
            return h + 1e-6 * jnp.tanh((h @ whead)[:, :D])
        out = jax.lax.fori_loop(0, STEPS, step, x0)
        return jnp.sum(out.astype(jnp.float32))

    timeit("weights + lm head", weights_head, W,
           bytes_per_step=layer_bytes * L + head_bytes)

    # 3. cache attention only (read full k/v per layer)
    def cache_attn(W):
        wqkv, wo, w1, w2, whead, x0, ck, cv = W
        def step(t, x):
            def body(i, h):
                q = h.reshape(B, 1, NH, HD)
                scores = jnp.einsum("bshd,blhd->bhsl", q, ck[i])
                p = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(h.dtype)
                o = jnp.einsum("bhsl,blhd->bshd", p, cv[i])
                return h + o.reshape(B, D)
            return jax.lax.fori_loop(0, L, body, x)
        out = jax.lax.fori_loop(0, STEPS, step, x0)
        return jnp.sum(out.astype(jnp.float32))

    timeit("cache attention only", cache_attn, W, bytes_per_step=cache_bytes)

    # 3b. cache attention, head-major (L, B, NH, CACHE, HD) layout: each head's
    # keys are contiguous, so the per-head q.k gemv streams instead of striding
    # over NH*HD
    @jax.jit
    def to_head_major(ck, cv):
        return (jnp.transpose(ck, (0, 1, 3, 2, 4)).copy(),
                jnp.transpose(cv, (0, 1, 3, 2, 4)).copy())

    ckh, cvh = to_head_major(ck, cv)
    jax.block_until_ready(cvh)

    def cache_attn_headmajor(args):
        x0, ckh, cvh = args
        def step(t, x):
            def body(i, h):
                q = h.reshape(B, NH, 1, HD)
                scores = jnp.einsum("bhsd,bhld->bhsl", q, ckh[i])
                p = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(h.dtype)
                o = jnp.einsum("bhsl,bhld->bhsd", p, cvh[i])
                return h + o.reshape(B, D)
            return jax.lax.fori_loop(0, L, body, x)
        out = jax.lax.fori_loop(0, STEPS, step, x0)
        return jnp.sum(out.astype(jnp.float32))

    timeit("cache attention, head-major layout", cache_attn_headmajor,
           (x0, ckh, cvh), bytes_per_step=cache_bytes)

    # 3c. cache attention, flattened (L, B, CACHE, NH*HD) "matmul" form: scores
    # via one (B, 1, D) x (B, CACHE, D) batched matmul per layer - wrong math
    # across heads mixes nothing here (random data), we only time the ACCESS
    # pattern of a fully-lane-contiguous read
    @jax.jit
    def to_flat(ck, cv):
        return (ck.reshape(L, B, CACHE_LEN, NH * HD).copy(),
                cv.reshape(L, B, CACHE_LEN, NH * HD).copy())

    ckf, cvf = to_flat(ck, cv)
    jax.block_until_ready(cvf)

    def cache_attn_flat(args):
        x0, ckf, cvf = args
        def step(t, x):
            def body(i, h):
                scores = jnp.einsum("bd,bld->bl", h, ckf[i])
                p = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(h.dtype)
                o = jnp.einsum("bl,bld->bd", p, cvf[i])
                return h + o
            return jax.lax.fori_loop(0, L, body, x)
        out = jax.lax.fori_loop(0, STEPS, step, x0)
        return jnp.sum(out.astype(jnp.float32))

    timeit("cache read, fully-contiguous upper bound", cache_attn_flat,
           (x0, ckf, cvf), bytes_per_step=cache_bytes)

    # 4. cache update only (DUS chain like the model)
    def cache_update(W):
        wqkv, wo, w1, w2, whead, x0, ck, cv = W
        def step(t, carry):
            x, ck, cv = carry
            def body(i, c):
                ck, cv = c
                kv = jnp.broadcast_to(x.reshape(1, B, 1, NH, HD), (1, B, 1, NH, HD))
                ck = jax.lax.dynamic_update_slice(ck, kv, (i, 0, t, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, kv, (i, 0, t, 0, 0))
                return ck, cv
            ck, cv = jax.lax.fori_loop(0, L, body, (ck, cv))
            return x, ck, cv
        _, ck, cv = jax.lax.fori_loop(0, STEPS, step, (x0, ck, cv))
        return jnp.sum(ck[0, 0, 0].astype(jnp.float32))

    timeit("cache DUS update only", cache_update, W)

    # 5. everything together (weights + head + attention + update)
    def full(W):
        wqkv, wo, w1, w2, whead, x0, ck, cv = W
        def step(t, carry):
            x, ck, cv = carry
            def body(i, c):
                h, ck, cv = c
                qkv = h @ wqkv[i]
                q = qkv[:, :D].reshape(B, 1, NH, HD)
                knew = qkv[:, D:2*D].reshape(1, B, 1, NH, HD)
                vnew = qkv[:, 2*D:].reshape(1, B, 1, NH, HD)
                ck = jax.lax.dynamic_update_slice(ck, knew.astype(ck.dtype), (i, 0, t, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, vnew.astype(cv.dtype), (i, 0, t, 0, 0))
                scores = jnp.einsum("bshd,blhd->bhsl", q, ck[i])
                p = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(h.dtype)
                o = jnp.einsum("bhsl,blhd->bshd", p, cv[i]).reshape(B, D)
                h = h + o @ wo[i]
                h = h + (h @ w1[i]) @ w2[i]
                return h, ck, cv
            h, ck, cv = jax.lax.fori_loop(0, L, body, (x, ck, cv))
            h = h + 1e-6 * jnp.tanh((h @ whead)[:, :D])
            return h, ck, cv
        x, ck, cv = jax.lax.fori_loop(0, STEPS, step, (x0, ck, cv))
        return jnp.sum(x.astype(jnp.float32))

    timeit("full synthetic decode step", full, W,
           bytes_per_step=layer_bytes * L + head_bytes + cache_bytes)

    # 6. int8 weights variant of (2): dequant fused into the matmul
    @jax.jit
    def quantize(W):
        wqkv, wo, w1, w2, whead = W[:5]
        q8 = lambda w: (w * 127).astype(jnp.int8)
        return q8(wqkv), q8(wo), q8(w1), q8(w2), q8(whead)

    W8 = quantize(W)
    sc = jnp.float32(1 / 127)

    def weights_head_int8(W8, x0):
        wqkv8, wo8, w18, w28, whead8 = W8
        def mm(h, w8):
            return (
                jax.lax.dot_general(
                    h, w8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * sc
            ).astype(jnp.bfloat16)
        def step(_, x):
            def body(i, h):
                qkv = mm(h, wqkv8[i])
                h = mm(qkv[:, :D], wo8[i])
                h = mm(mm(h, w18[i]), w28[i])
                return h
            h = jax.lax.fori_loop(0, L, body, x)
            return h + 1e-6 * jnp.tanh(mm(h, whead8)[:, :D])
        out = jax.lax.fori_loop(0, STEPS, step, x0)
        return jnp.sum(out.astype(jnp.float32))

    timeit("weights + head, int8", weights_head_int8, W8, x0,
           bytes_per_step=(layer_bytes * L + head_bytes) // 2)


if __name__ == "__main__" and os.environ.get("INT8_CACHE_PROBE") != "1":
    main()


def int8_cache_probe():
    """Does an int8 KV cache pay? Times the cache-attention gemv with int8
    k/v + per-(batch,head) f32 scales dequantized on the fly. If XLA fuses
    the convert+scale into the dot's operand read (it does for int8
    weights: 583 GB/s effective), the 3.4 ms cache read halves."""
    @jax.jit
    def make(key):
        ks = jax.random.split(key, 3)
        x0 = jax.random.normal(ks[0], (B, D), jnp.bfloat16)
        ck8 = jax.random.randint(ks[1], (L, B, CACHE_LEN, NH, HD), -127, 127, jnp.int8)
        cv8 = jax.random.randint(ks[2], (L, B, CACHE_LEN, NH, HD), -127, 127, jnp.int8)
        scale = jnp.full((L, B, 1, NH, 1), 0.01, jnp.float32)
        return x0, ck8, cv8, scale

    x0, ck8, cv8, scale = make(jax.random.PRNGKey(0))
    jax.block_until_ready(cv8)
    cache_bytes = ck8.size + cv8.size  # int8: half the bf16 stream

    def cache_attn_int8(args):
        x0, ck8, cv8, scale = args
        def step(t, x):
            def body(i, h):
                q = h.reshape(B, 1, NH, HD)
                k = (ck8[i].astype(jnp.float32) * scale[i]).astype(jnp.bfloat16)
                v = (cv8[i].astype(jnp.float32) * scale[i]).astype(jnp.bfloat16)
                scores = jnp.einsum("bshd,blhd->bhsl", q, k)
                p = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(h.dtype)
                o = jnp.einsum("bhsl,blhd->bshd", p, v)
                return h + o.reshape(B, D)
            return jax.lax.fori_loop(0, L, body, x)
        out = jax.lax.fori_loop(0, STEPS, step, x0)
        return jnp.sum(out.astype(jnp.float32))

    timeit("cache attention, int8 kv + dequant", cache_attn_int8,
           (x0, ck8, cv8, scale), bytes_per_step=cache_bytes)


if __name__ == "__main__" and os.environ.get("INT8_CACHE_PROBE") == "1":
    int8_cache_probe()
