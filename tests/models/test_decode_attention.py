"""Pallas decode-step attention kernel (ops/decode_attention.py): interpret-
mode correctness vs the XLA decode numerics, int8 round-trip, and the
end-to-end int8-KV-cache serving path on a tiny OPT model."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu import configs
from eilev_tpu.models import opt as opt_mod
from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration as VB
from eilev_tpu.ops.decode_attention import (
    decode_attention_stacked,
    dequantize_kv,
    quantize_kv,
)

B, L, S, NH, HD = 2, 3, 24, 4, 8
D = NH * HD


def _reference_decode_attention(q, k, v, mask, scale):
    """The XLA decode path's numerics (ops/attention._xla_attention with
    scale_query_first + softmax_in_fp32, single query token)."""
    qh = (q * jnp.asarray(scale, q.dtype)).reshape(B, NH, HD)
    kh = k.reshape(B, S, NH, HD)
    vh = v.reshape(B, S, NH, HD)
    scores = jnp.einsum("bhd,bshd->bhs", qh, kh)
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, scores.dtype)
    scores = jnp.where(mask[:, None, :].astype(bool), scores, neg)
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhs,bshd->bhd", p, vh)
    return out.reshape(B, D)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_bf16_kernel_matches_xla_reference(dtype):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, D)), dtype)
    k_buf = jnp.asarray(rng.normal(size=(L, B, S, D)), dtype)
    v_buf = jnp.asarray(rng.normal(size=(L, B, S, D)), dtype)
    mask = jnp.asarray(rng.integers(0, 2, size=(B, S)), jnp.int32)
    mask = mask.at[:, 0].set(1)  # at least one attendable slot
    scale = HD**-0.5
    for layer in range(L):
        got = decode_attention_stacked(
            q, k_buf, v_buf, mask, layer, num_heads=NH, head_dim=HD,
            scale=scale, interpret=True,
        )
        ref = _reference_decode_attention(q, k_buf[layer], v_buf[layer], mask, scale)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
            atol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
        )


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, S, NH, HD)) * 3.0, jnp.bfloat16)
    vals, scale = quantize_kv(x)
    back = dequantize_kv(vals, scale)
    err = np.abs(np.asarray(back, np.float32) - np.asarray(x, np.float32))
    # per-head amax / 127 is the quantization step; allow one step + bf16 noise
    step = np.asarray(scale, np.float32)[..., None]
    assert (err <= step * 0.75 + 0.02).all()


def test_int8_kernel_matches_dequant_reference():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, D)), jnp.bfloat16)
    kf = jnp.asarray(rng.normal(size=(L, B, S, NH, HD)), jnp.bfloat16)
    vf = jnp.asarray(rng.normal(size=(L, B, S, NH, HD)), jnp.bfloat16)
    k8, ks = quantize_kv(kf)
    v8, vs = quantize_kv(vf)
    mask = jnp.ones((B, S), jnp.int32)
    got = decode_attention_stacked(
        q, k8.reshape(L, B, S, D), v8.reshape(L, B, S, D), mask, 1,
        num_heads=NH, head_dim=HD, k_scale=ks, v_scale=vs, interpret=True,
    )
    kd = dequantize_kv(k8[1], ks[1]).reshape(B, S, D)
    vd = dequantize_kv(v8[1], vs[1]).reshape(B, S, D)
    ref = _reference_decode_attention(q, kd, vd, mask, HD**-0.5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def _tiny_int8kv_model():
    cfg = configs.tiny_config(text_model="opt")
    cfg = configs.replace(
        cfg, text_config=dataclasses.replace(cfg.text_config, int8_kv_cache=True)
    )
    return cfg, VB(cfg)


@pytest.mark.slow
def test_int8_cache_decode_close_to_bf16():
    """One prefill + one decode step with the int8 cache (CPU fallback path =
    materialized dequant, same math as the kernel): logits stay close to the
    bf16-cache logits, and the cache pytree carries the scale buffers."""
    cfg, model = _tiny_int8kv_model()
    cfg_bf16 = configs.tiny_config(text_model="opt")
    model_bf16 = VB(cfg_bf16)

    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(4, cfg.text_config.vocab_size, size=(2, 10)))
    params = model_bf16.init(jax.random.PRNGKey(0), input_ids=ids)["params"]

    def run(mdl, c):
        embeds = mdl.apply({"params": params}, ids, method=VB.lm_embed)
        cache = opt_mod.init_cache(c.text_config, 2, 12, dtype=jnp.float32)
        logits, cache = mdl.apply(
            {"params": params}, embeds,
            attention_mask=jnp.ones_like(ids), cache=cache, method=VB.lm_forward,
        )
        tok = jnp.argmax(logits[:, -1:], -1)
        step = mdl.apply({"params": params}, tok, method=VB.lm_embed)
        logits2, cache = mdl.apply(
            {"params": params}, step,
            attention_mask=jnp.ones((2, 1), jnp.int32), cache=cache,
            method=VB.lm_forward,
        )
        return logits2[:, -1], cache

    l8, cache8 = run(model, cfg)
    lb, _ = run(model_bf16, cfg_bf16)
    assert cache8["k"].dtype == jnp.int8 and "k_scale" in cache8
    np.testing.assert_allclose(
        np.asarray(l8), np.asarray(lb), rtol=0.1, atol=0.15
    )


def test_int8_cache_classify_scores_finite():
    """Round 4: score_with_prefix READS int8 prompt caches (was a
    NotImplementedError guard); numeric agreement with the fp32 cache is
    covered by tests/generation/test_int8_serving.py — here just prove the
    dequant read path produces finite scores end to end."""
    cfg, model = _tiny_int8kv_model()
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(4, cfg.text_config.vocab_size, size=(1, 6)))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    embeds = model.apply({"params": params}, ids, method=VB.lm_embed)
    cache = opt_mod.init_cache(cfg.text_config, 1, 8, dtype=jnp.float32)
    _, cache = model.apply(
        {"params": params}, embeds, attention_mask=jnp.ones_like(ids),
        cache=cache, method=VB.lm_forward,
    )
    cls = model.apply(
        {"params": params}, jnp.zeros((1, 2, 3), jnp.int32), method=VB.lm_embed
    )
    logits = model.apply(
        {"params": params}, cls, jnp.ones((1, 2, 3), jnp.int32), cache,
        method=VB.lm_score_with_prefix,
    )
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_gqa_kernel_matches_dequant_reference():
    """GQA (kv_heads < num_heads) + score-side scaling (the LLaMA layout)."""
    KVH = 2
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(B, D)), jnp.bfloat16)
    kf = jnp.asarray(rng.normal(size=(L, B, S, KVH, HD)), jnp.bfloat16)
    vf = jnp.asarray(rng.normal(size=(L, B, S, KVH, HD)), jnp.bfloat16)
    k8, ks = quantize_kv(kf)
    v8, vs = quantize_kv(vf)
    mask = jnp.ones((B, S), jnp.int32)
    got = decode_attention_stacked(
        q, k8.reshape(L, B, S, KVH * HD), v8.reshape(L, B, S, KVH * HD), mask, 0,
        num_heads=NH, head_dim=HD, kv_heads=KVH, scale_query=False,
        k_scale=ks, v_scale=vs, interpret=True,
    )
    kd = dequantize_kv(k8[0], ks[0])
    vd = dequantize_kv(v8[0], vs[0])
    rep = NH // KVH
    kd = jnp.repeat(kd, rep, axis=2).reshape(B, S, D)
    vd = jnp.repeat(vd, rep, axis=2).reshape(B, S, D)
    # score-side scaling reference
    qh = q.reshape(B, NH, HD)
    scores = (
        jnp.einsum("bhd,bshd->bhs", qh, kd.reshape(B, S, NH, HD)).astype(jnp.bfloat16)
        * jnp.bfloat16(HD**-0.5)
    )
    p = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(jnp.bfloat16)
    ref = jnp.einsum("bhs,bshd->bhd", p, vd.reshape(B, S, NH, HD)).reshape(B, D)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


@pytest.mark.slow
def test_llama_int8_cache_decode_close_to_bf16():
    """TextLM-role LLaMA with int8_kv_cache: greedy decode logits stay close
    to the bf16-cache path (CPU fallback = materialized dequant)."""
    from eilev_tpu.configs import LlamaConfig
    from eilev_tpu.models.llama import LlamaForCausalLM

    def mk(int8):
        cfg = LlamaConfig(
            vocab_size=96, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
            max_position_embeddings=64, int8_kv_cache=int8,
        )
        return cfg, LlamaForCausalLM(cfg)

    cfg, model = mk(False)
    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(2, 8)))
    # init through embed + forward so every param exists
    def init_all(mdl):
        return mdl(mdl.embed(jnp.zeros((1, 4), jnp.int32)))

    params = LlamaForCausalLM(cfg).init(jax.random.PRNGKey(0), method=init_all)["params"]

    def run(int8):
        c, m = mk(int8)
        embeds = m.apply({"params": params}, ids, method=LlamaForCausalLM.embed)
        cache = opt_mod.init_cache(c, 2, 12, dtype=jnp.float32)
        logits, cache = m.apply(
            {"params": params}, embeds, attention_mask=jnp.ones_like(ids), cache=cache
        )
        tok = jnp.argmax(logits[:, -1:], -1)
        step = m.apply({"params": params}, tok, method=LlamaForCausalLM.embed)
        logits2, cache = m.apply(
            {"params": params}, step, attention_mask=jnp.ones((2, 1), jnp.int32),
            cache=cache,
        )
        return logits2[:, -1], cache

    l8, c8 = run(True)
    lb, _ = run(False)
    assert c8["k"].dtype == jnp.int8 and "k_scale" in c8
    np.testing.assert_allclose(np.asarray(l8), np.asarray(lb), rtol=0.12, atol=0.15)
