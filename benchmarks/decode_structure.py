#!/usr/bin/env python
"""Where do the ~4 ms of per-step decode 'structure' go? (round-3 kernel guide)

decode_variants.py bounded the weight+cache+DUS floor at ~10.4 ms/step; the
real model step is ~14.4. This file starts from that synthetic full step and
adds the real step's remaining structure ONE INGREDIENT AT A TIME (LayerNorms,
real lm-head + token select + re-embed, position bookkeeping, eos logic), so
the delta of each line is the cost of that ingredient. Drives the decision of
what a fused decode kernel must absorb (docs/PERF.md round 3).
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


def timeit(name, fn, *args):
    jfn = jax.jit(fn)
    float(jfn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(json.dumps({"variant": name, "ms_per_step": round(1000 * med / STEPS, 2)}),
          flush=True)
    return med


def layernorm(x, g, b):
    # flax LayerNorm(use_fast_variance=False) numerics: f32 mean/var
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, -1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    return (y * g + b).astype(x.dtype)


def main():
    @jax.jit
    def make_all(key):
        ks = jax.random.split(key, 10)
        s = jnp.bfloat16(0.02)
        return (
            jax.random.normal(ks[0], (L, D, 3 * D), jnp.bfloat16) * s,
            jax.random.normal(ks[1], (L, D, D), jnp.bfloat16) * s,
            jax.random.normal(ks[2], (L, D, FFN), jnp.bfloat16) * s,
            jax.random.normal(ks[3], (L, FFN, D), jnp.bfloat16) * s,
            jax.random.normal(ks[4], (VOCAB, D), jnp.bfloat16) * s,  # tied embed
            jax.random.normal(ks[5], (B, D), jnp.bfloat16),
            jax.random.normal(ks[6], (L, B, CACHE_LEN, NH, HD), jnp.bfloat16),
            jax.random.normal(ks[7], (L, B, CACHE_LEN, NH, HD), jnp.bfloat16),
            jax.random.normal(ks[8], (L, 2, D), jnp.bfloat16),  # ln gamma/beta x2
            jax.random.normal(ks[9], (2050, D), jnp.bfloat16),  # pos embed table
        )

    W = make_all(jax.random.PRNGKey(0))
    jax.block_until_ready(W)

    def make_step(with_ln, with_head, with_pos, with_eos):
        def run(W):
            wqkv, wo, w1, w2, emb, x0, ck, cv, lns, pos_tab = W

            def step(t, carry):
                x, ck, cv, mask, pos, finished = carry

                def body(i, c):
                    h, ck, cv = c
                    res = h
                    if with_ln:
                        h = layernorm(h, lns[i, 0], lns[i, 1])
                    qkv = h @ wqkv[i]
                    q = qkv[:, :D].reshape(B, 1, NH, HD)
                    knew = qkv[:, D:2 * D].reshape(1, B, 1, NH, HD)
                    vnew = qkv[:, 2 * D:].reshape(1, B, 1, NH, HD)
                    ck = jax.lax.dynamic_update_slice(ck, knew.astype(ck.dtype), (i, 0, t, 0, 0))
                    cv = jax.lax.dynamic_update_slice(cv, vnew.astype(cv.dtype), (i, 0, t, 0, 0))
                    scores = jnp.einsum("bshd,blhd->bhsl", q, ck[i])
                    if with_pos:  # padding mask over the cache, like the model
                        scores = jnp.where(
                            mask[:, None, None, :].astype(bool),
                            scores, jnp.asarray(jnp.finfo(jnp.float32).min, scores.dtype),
                        )
                    p = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(h.dtype)
                    o = jnp.einsum("bhsl,blhd->bshd", p, cv[i]).reshape(B, D)
                    h = res + o @ wo[i]
                    res = h
                    if with_ln:
                        h = layernorm(h, lns[i, 1], lns[i, 0])
                    h = res + jax.nn.relu(h @ w1[i]) @ w2[i]
                    return h, ck, cv

                h, ck, cv = jax.lax.fori_loop(0, L, body, (x, ck, cv))
                if with_ln:
                    h = layernorm(h, lns[0, 0], lns[0, 1])
                if with_head:
                    logits = h @ emb.T  # tied head -> (B, VOCAB)
                    tok = jnp.argmax(logits, -1).astype(jnp.int32)
                    if with_eos:
                        tok = jnp.where(finished, 1, tok)
                        finished = finished | (tok == 2)
                    h = emb[tok]  # re-embed the selected token
                if with_pos:
                    mask = jax.lax.dynamic_update_slice(
                        mask, jnp.ones((B, 1), jnp.int32), (0, t)
                    )
                    pos = pos + 1
                    h = h + pos_tab[jnp.clip(pos, 0, 2049)]
                return h, ck, cv, mask, pos, finished

            mask0 = jnp.ones((B, CACHE_LEN), jnp.int32)
            pos0 = jnp.full((B,), 700, jnp.int32)
            fin0 = jnp.zeros((B,), bool)
            x, ck, cv, *_ = jax.lax.fori_loop(
                0, STEPS, step, (W[5], ck, cv, mask0, pos0, fin0)
            )
            return jnp.sum(x.astype(jnp.float32))

        return run

    timeit("baseline (weights+attn+DUS, relu mlp)",
           make_step(False, False, False, False), W)
    timeit("+ 2 LayerNorms/layer + final", make_step(True, False, False, False), W)
    timeit("+ real lm head + argmax + re-embed",
           make_step(True, True, False, False), W)
    timeit("+ positions + cache-mask DUS + masked scores",
           make_step(True, True, True, False), W)
    timeit("+ eos/finished bookkeeping (≈ real step)",
           make_step(True, True, True, True), W)


if __name__ == "__main__" and os.environ.get("LOOP_PROBE") != "1":
    main()


def loop_structure_probe():
    """Isolate the program-structure cost: the real model unrolls 32 layers in
    Python over SEPARATE per-layer weight arrays; the synthetic step above
    fori-loops over stacked (L, ...) arrays. Same math, same bytes."""
    @jax.jit
    def make_all(key):
        ks = jax.random.split(key, 8)
        s = jnp.bfloat16(0.02)
        return (
            jax.random.normal(ks[0], (L, D, 3 * D), jnp.bfloat16) * s,
            jax.random.normal(ks[1], (L, D, D), jnp.bfloat16) * s,
            jax.random.normal(ks[2], (L, D, FFN), jnp.bfloat16) * s,
            jax.random.normal(ks[3], (L, FFN, D), jnp.bfloat16) * s,
            jax.random.normal(ks[5], (B, D), jnp.bfloat16),
            jax.random.normal(ks[6], (L, B, CACHE_LEN, NH, HD), jnp.bfloat16),
            jax.random.normal(ks[7], (L, B, CACHE_LEN, NH, HD), jnp.bfloat16),
        )

    W = make_all(jax.random.PRNGKey(0))
    jax.block_until_ready(W)
    wqkv, wo, w1, w2, x0, ck, cv = W

    def body_math(h, ck, cv, wq, wo_, w1_, w2_, i, t):
        qkv = h @ wq
        q = qkv[:, :D].reshape(B, 1, NH, HD)
        knew = qkv[:, D:2 * D].reshape(1, B, 1, NH, HD)
        vnew = qkv[:, 2 * D:].reshape(1, B, 1, NH, HD)
        ck = jax.lax.dynamic_update_slice(ck, knew.astype(ck.dtype), (i, 0, t, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, vnew.astype(cv.dtype), (i, 0, t, 0, 0))
        scores = jnp.einsum("bshd,blhd->bhsl", q, ck[i])
        p = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(h.dtype)
        o = jnp.einsum("bhsl,blhd->bshd", p, cv[i]).reshape(B, D)
        h = h + o @ wo_
        h = h + jax.nn.relu(h @ w1_) @ w2_
        return h, ck, cv

    def stacked_fori(W):
        wqkv, wo, w1, w2, x0, ck, cv = W
        def step(t, carry):
            x, ck, cv = carry
            def body(i, c):
                h, ck, cv = c
                return body_math(h, ck, cv, wqkv[i], wo[i], w1[i], w2[i], i, t)
            h, ck, cv = jax.lax.fori_loop(0, L, body, (x, ck, cv))
            return h, ck, cv
        x, ck, cv = jax.lax.fori_loop(0, STEPS, step, (x0, ck, cv))
        return jnp.sum(x.astype(jnp.float32))

    timeit("stacked weights, fori over layers", stacked_fori, W)

    def stacked_unrolled(W):
        wqkv, wo, w1, w2, x0, ck, cv = W
        def step(t, carry):
            x, ck, cv = carry
            h = x
            for i in range(L):  # python-unrolled, same stacked arrays
                h, ck, cv = body_math(h, ck, cv, wqkv[i], wo[i], w1[i], w2[i], i, t)
            return h, ck, cv
        x, ck, cv = jax.lax.fori_loop(0, STEPS, step, (x0, ck, cv))
        return jnp.sum(x.astype(jnp.float32))

    timeit("stacked weights, python-unrolled layers", stacked_unrolled, W)

    @jax.jit
    def split_weights(W):
        wqkv, wo, w1, w2 = W[:4]
        return [(wqkv[i], wo[i], w1[i], w2[i]) for i in range(L)]

    Wsep = split_weights(W)
    jax.block_until_ready(Wsep)

    def separate_unrolled(args):
        Wsep, x0, ck, cv = args
        def step(t, carry):
            x, ck, cv = carry
            h = x
            for i, (wq, wo_, w1_, w2_) in enumerate(Wsep):
                h, ck, cv = body_math(h, ck, cv, wq, wo_, w1_, w2_, i, t)
            return h, ck, cv
        x, ck, cv = jax.lax.fori_loop(0, STEPS, step, (x0, ck, cv))
        return jnp.sum(x.astype(jnp.float32))

    timeit("separate per-layer weights, python-unrolled (≈ real model)",
           separate_unrolled, (Wsep, x0, ck, cv))


if __name__ == "__main__" and os.environ.get("LOOP_PROBE") == "1":
    loop_structure_probe()
