"""Weight-only int8 serving path (ops/quantization.py).

Guards: (a) the quantizer's reconstruction error is the rounding bound,
(b) an int8-flagged model consumes quantized trees and tracks the bf16
model's logits closely, (c) the end-to-end generate() path runs with an
int8 LM and emits valid tokens.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig, generate
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.ops.quantization import (
    Int8Dense,
    quantize_int8,
    quantize_lm_params,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32)) * 0.1
    w8, scale = quantize_int8(w)
    assert w8.dtype == jnp.int8 and scale.shape == (48,)
    recon = w8.astype(jnp.float32) * scale
    # max error per channel is half a quantization step
    err = jnp.max(jnp.abs(recon - w), axis=0)
    bound = jnp.max(jnp.abs(w), axis=0) / 127.0 * 0.5 + 1e-8
    assert (err <= bound + 1e-6).all()


def test_int8_dense_matches_dense():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 10, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 24)).astype(np.float32)) * 0.05
    b = jnp.asarray(rng.normal(size=(24,)).astype(np.float32)) * 0.01
    ref = x @ w + b
    w8, scale = quantize_int8(w)
    mod = Int8Dense(features=24, dtype=jnp.float32)
    got = mod.apply({"params": {"w8": w8, "scale": scale, "bias": b}}, x)
    # relative error bounded by the weight rounding (~0.4% of channel scale)
    rel = jnp.abs(got - ref) / (jnp.abs(ref) + 1e-3)
    assert float(jnp.median(rel)) < 0.02, float(jnp.median(rel))


def _tiny_models():
    cfg = configs.tiny_config(text_model="opt")
    qcfg = configs.replace(
        cfg,
        text_config=dataclasses.replace(cfg.text_config, quantize_matmuls=True),
    )
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.float32)
    qmodel = VideoBlipForConditionalGeneration(qcfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    b, t, s = 2, 2, 12
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(b, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, s))
    vim = np.zeros((b, s), np.int64)
    vim[:, 1 : 1 + cfg.num_query_tokens] = 1
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
    )["params"]
    qparams = dict(params)
    qparams["language_model"] = quantize_lm_params(params["language_model"])
    return cfg, model, qmodel, params, qparams, ids, pixel, vim


def test_quantized_tree_matches_init_structure():
    cfg, model, qmodel, params, qparams, ids, pixel, vim = _tiny_models()
    expect = qmodel.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
    )["params"]
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree.leaves_with_path(qparams)}
    want_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree.leaves_with_path(expect)}
    assert got_paths == want_paths


@pytest.mark.slow
def test_int8_generate_runs_and_tracks_bf16():
    cfg, model, qmodel, params, qparams, ids, pixel, vim = _tiny_models()
    gen_cfg = GenerationConfig(max_new_tokens=5, pad_token_id=1)
    kw = dict(
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
        generation_config=gen_cfg,
    )
    ref = np.asarray(generate(model, {"params": params}, **kw))
    got = np.asarray(generate(qmodel, {"params": qparams}, **kw))
    assert got.shape == ref.shape
    assert (got >= 0).all() and (got < cfg.text_config.vocab_size).all()
    # logit-level closeness: compare the LM forward on the same embeddings
    embeds = model.apply(
        {"params": params},
        jnp.asarray(ids),
        jnp.asarray(pixel),
        jnp.asarray(vim),
        method=type(model).embed_and_scatter,
    )
    ref_logits, _ = model.apply(
        {"params": params}, embeds, attention_mask=jnp.ones_like(jnp.asarray(ids)),
        method=type(model).lm_forward,
    )
    got_logits, _ = qmodel.apply(
        {"params": qparams}, embeds, attention_mask=jnp.ones_like(jnp.asarray(ids)),
        method=type(qmodel).lm_forward,
    )
    a = np.asarray(ref_logits, np.float32).reshape(-1)
    g = np.asarray(got_logits, np.float32).reshape(-1)
    cos = float(np.dot(a, g) / (np.linalg.norm(a) * np.linalg.norm(g) + 1e-9))
    assert cos > 0.999, cos


@pytest.mark.slow
def test_w8a8_prefill_dispatch_and_generate():
    """w8a8_prefill: same {w8, scale, bias} params serve two program forms —
    prefill (rows >= threshold) on the int8 x int8 MXU path, decode (batch
    rows) weight-only. Generation must run and the prefill logits must track
    the weight-only int8 logits (extra error = activation rounding only)."""
    from eilev_tpu.ops.quantization import W8A8_PREFILL_MIN_ROWS

    cfg, model, qmodel, params, qparams, ids, pixel, vim = _tiny_models()
    wcfg = configs.replace(
        cfg,
        text_config=dataclasses.replace(
            cfg.text_config, quantize_matmuls=True, w8a8_prefill=True
        ),
    )
    wmodel = VideoBlipForConditionalGeneration(wcfg, dtype=jnp.float32)
    # tiny prompts are below the row threshold; verify the dispatch boundary
    # directly on Int8Dense
    from eilev_tpu.ops.quantization import Int8Dense, quantize_int8

    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)) * 0.05
    w8, scale = quantize_int8(w)
    tree = {"params": {"w8": w8, "scale": scale, "bias": jnp.zeros((8,), jnp.float32)}}
    mod = Int8Dense(features=8, dtype=jnp.float32, w8a8_min_rows=W8A8_PREFILL_MIN_ROWS)
    x_small = jnp.asarray(rng.normal(size=(2, 3, 16)).astype(np.float32))
    x_big = jnp.asarray(rng.normal(size=(2, W8A8_PREFILL_MIN_ROWS, 16)).astype(np.float32))
    y_small = mod.apply(tree, x_small)
    y_small_ref = Int8Dense(features=8, dtype=jnp.float32).apply(tree, x_small)
    np.testing.assert_array_equal(np.asarray(y_small), np.asarray(y_small_ref))
    y_big = mod.apply(tree, x_big)
    y_big_ref = Int8Dense(features=8, dtype=jnp.float32).apply(tree, x_big)
    # W8A8 differs from weight-only by activation rounding, but only slightly
    assert not np.array_equal(np.asarray(y_big), np.asarray(y_big_ref))
    rel = np.abs(np.asarray(y_big) - np.asarray(y_big_ref)) / (
        np.abs(np.asarray(y_big_ref)) + 1e-2
    )
    assert float(np.median(rel)) < 0.05, float(np.median(rel))

    # end to end: generation with the w8a8 model emits valid tokens
    gen_cfg = GenerationConfig(max_new_tokens=4, pad_token_id=1)
    out = np.asarray(
        generate(
            wmodel, {"params": qparams},
            input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim), generation_config=gen_cfg,
        )
    )
    assert out.shape == (ids.shape[0], 4)
    assert (out >= 0).all() and (out < cfg.text_config.vocab_size).all()


@pytest.mark.slow
def test_int8_qformer_tracks_fp32():
    """W8A8 Q-Former serving mode: quantized subtree matches the flagged
    init structure and the video features track the fp32 features."""
    from eilev_tpu.ops.quantization import quantize_qformer_params

    cfg, model, qmodel, params, qparams, ids, pixel, vim = _tiny_models()
    qfcfg = configs.replace(
        cfg,
        qformer_config=dataclasses.replace(cfg.qformer_config, quantize_matmuls=True),
    )
    qfmodel = VideoBlipForConditionalGeneration(qfcfg, dtype=jnp.float32)
    qfparams = dict(params)
    qfparams["qformer"] = quantize_qformer_params(params["qformer"])

    expect = qfmodel.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
    )["params"]["qformer"]
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree.leaves_with_path(qfparams["qformer"])}
    want_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree.leaves_with_path(expect)}
    assert got_paths == want_paths

    ref = model.apply(
        {"params": params}, jnp.asarray(pixel), method=type(model).encode_videos
    )
    got = qfmodel.apply(
        {"params": qfparams}, jnp.asarray(pixel), method=type(qfmodel).encode_videos
    )
    a = np.asarray(ref, np.float32).reshape(-1)
    g = np.asarray(got, np.float32).reshape(-1)
    cos = float(np.dot(a, g) / (np.linalg.norm(a) * np.linalg.norm(g) + 1e-9))
    assert cos > 0.99, cos


@pytest.mark.slow
def test_int8_kv_classify_tracks_fp32():
    """classify/score_with_prefix with an int8 prompt cache (round 4: closes
    the icl_eval serving gap — the class continuations read the shared cache
    through a materialized dequant, so the 188/793-class ICL eval can run on
    the int8 serving stack). Scores must track the fp32-cache scores and the
    predicted class must agree; class_batch_size chunking must be exact."""
    from eilev_tpu.generation import classify

    cfg, model, qmodel, params, qparams, ids, pixel, vim = _tiny_models()
    kvcfg = configs.replace(
        cfg, text_config=dataclasses.replace(cfg.text_config, int8_kv_cache=True)
    )
    kvmodel = VideoBlipForConditionalGeneration(kvcfg, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    class_ids = jnp.asarray(rng.integers(4, cfg.text_config.vocab_size, size=(6, 3)))
    kw = dict(
        prompt_input_ids=jnp.asarray(ids),
        class_input_ids=class_ids,
        pixel_values=jnp.asarray(pixel),
        prompt_video_input_mask=jnp.asarray(vim),
    )
    ref = np.asarray(classify(model, {"params": params}, **kw))
    got = np.asarray(classify(kvmodel, {"params": params}, **kw))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.argmax(got, -1), np.argmax(ref, -1))
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.1)
    # chunked == unchunked with the int8 cache
    chunked = np.asarray(classify(kvmodel, {"params": params}, class_batch_size=2, **kw))
    np.testing.assert_allclose(chunked, got, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# W8A8 vision serving mode (int8 MXU path; ops/quantization.py)
# ---------------------------------------------------------------------------


def test_w8a8_dense_matches_dense():
    from eilev_tpu.ops.quantization import Int8W8A8Dense

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(3, 10, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 24)).astype(np.float32)) * 0.05
    b = jnp.asarray(rng.normal(size=(24,)).astype(np.float32)) * 0.01
    ref = x @ w + b
    w8, scale = quantize_int8(w)
    mod = Int8W8A8Dense(features=24, dtype=jnp.float32)
    got = mod.apply({"params": {"w8": w8, "scale": scale, "bias": b}}, x)
    # weight + per-token activation rounding: looser than weight-only
    rel = jnp.abs(got - ref) / (jnp.abs(ref) + 1e-3)
    assert float(jnp.median(rel)) < 0.05, float(jnp.median(rel))


def _tiny_w8a8_vision():
    from eilev_tpu.ops.quantization import quantize_vision_params

    cfg = configs.tiny_config(text_model="opt")
    qcfg = configs.replace(
        cfg,
        vision_config=dataclasses.replace(cfg.vision_config, quantize_matmuls=True),
    )
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.float32)
    qmodel = VideoBlipForConditionalGeneration(qcfg, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    b, t, s = 2, 2, 12
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(b, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, s))
    vim = np.zeros((b, s), np.int64)
    vim[:, 1 : 1 + cfg.num_query_tokens] = 1
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
    )["params"]
    qparams = dict(params)
    qparams["vision_model"] = quantize_vision_params(params["vision_model"])
    return cfg, model, qmodel, params, qparams, ids, pixel, vim


def test_w8a8_vision_tree_matches_init_structure():
    cfg, model, qmodel, params, qparams, ids, pixel, vim = _tiny_w8a8_vision()
    expect = qmodel.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
    )["params"]
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree.leaves_with_path(qparams)}
    want_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree.leaves_with_path(expect)}
    assert got_paths == want_paths


def test_w8a8_vision_forward_tracks_fp32():
    cfg, model, qmodel, params, qparams, ids, pixel, vim = _tiny_w8a8_vision()
    kw = dict(
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
    )
    ref = model.apply({"params": params}, method=type(model).embed_and_scatter, **kw)
    got = qmodel.apply({"params": qparams}, method=type(qmodel).embed_and_scatter, **kw)
    a = np.asarray(ref, np.float32).reshape(-1)
    g = np.asarray(got, np.float32).reshape(-1)
    cos = float(np.dot(a, g) / (np.linalg.norm(a) * np.linalg.norm(g) + 1e-9))
    assert cos > 0.99, cos
    # end to end: generate() still emits valid tokens through the W8A8 tower
    gen_cfg = GenerationConfig(max_new_tokens=4, pad_token_id=1)
    toks = np.asarray(
        generate(qmodel, {"params": qparams}, generation_config=gen_cfg, **kw)
    )
    assert (toks >= 0).all() and (toks < cfg.text_config.vocab_size).all()
