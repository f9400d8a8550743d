"""VideoFeatureCache (eilev_tpu/serving/feature_cache.py).

Load-bearing guarantees: cached features are BIT-IDENTICAL to the monolithic
in-prompt encode (so ``generate(video_features=...)`` and
``classify(video_features=...)`` are token-/score-identical to the pixel
path), the bucketed miss encode pads without contaminating real rows, and the
LRU bookkeeping (hits, in-call dedup, eviction, capacity < call size) is
correct.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig, classify, generate
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration as VB
from eilev_tpu.serving import VideoFeatureCache


@pytest.fixture(scope="module")
def world():
    cfg = configs.tiny_config(text_model="opt")
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    t = 2
    img = cfg.vision_config.image_size
    q = cfg.num_query_tokens

    def make_videos(n, seed):
        return np.random.default_rng(seed).normal(size=(n, 3, t, img, img)).astype(
            np.float32
        )

    def make_prompt(n_videos, n_text, seed):
        r = np.random.default_rng(seed)
        ids, vim = [2], [0]
        for _ in range(n_videos):
            ids += [1] * q + [5]
            vim += [1] * q + [0]
        ids += r.integers(4, cfg.text_config.vocab_size, size=(n_text,)).tolist()
        vim += [0] * n_text
        return np.asarray([ids]), np.asarray([vim])

    ids, vim = make_prompt(2, 6, 0)
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(make_videos(2, 0)),
        video_input_mask=jnp.asarray(vim),
    )["params"]
    return cfg, model, {"params": params}, make_videos, make_prompt


def _direct_features(model, variables, pixel):
    return model.apply(variables, jnp.asarray(pixel), method=VB.encode_videos)


def test_features_bit_identical_to_direct_encode(world):
    cfg, model, variables, make_videos, _ = world
    pixel = make_videos(5, 1)
    cache = VideoFeatureCache(model, variables, bucket=2)
    got = cache.features([f"v{i}" for i in range(5)], pixel)
    want = _direct_features(model, variables, pixel)
    # per-video independence through the ViT + Q-Former: the bucketed encode
    # (2+2+1-padded-to-2) reproduces the monolithic 5-video encode up to XLA's
    # batch-size-dependent reduction tiling (same tolerance as the
    # vision_chunks equivalence test in tests/models/test_hf_parity.py)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
    assert cache.misses == 5 and cache.hits == 0


def test_generate_token_identical_with_features(world):
    cfg, model, variables, make_videos, make_prompt = world
    pixel = make_videos(3, 2)
    ids, vim = make_prompt(3, 5, 2)
    gen_cfg = GenerationConfig(max_new_tokens=6, pad_token_id=1)
    want = generate(
        model, variables,
        input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim), generation_config=gen_cfg,
    )
    cache = VideoFeatureCache(model, variables, bucket=2)
    feats = cache.features(["a", "b", "c"], pixel)
    got = generate(
        model, variables,
        input_ids=jnp.asarray(ids), video_features=feats,
        video_input_mask=jnp.asarray(vim), generation_config=gen_cfg,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("num_beams", [3])
def test_generate_beam_identical_with_features(world, num_beams):
    cfg, model, variables, make_videos, make_prompt = world
    pixel = make_videos(2, 3)
    ids, vim = make_prompt(2, 4, 3)
    gen_cfg = GenerationConfig(max_new_tokens=5, pad_token_id=1, num_beams=num_beams)
    want = generate(
        model, variables,
        input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim), generation_config=gen_cfg,
    )
    cache = VideoFeatureCache(model, variables)
    feats = cache.features(["x", "y"], pixel)
    got = generate(
        model, variables,
        input_ids=jnp.asarray(ids), video_features=feats,
        video_input_mask=jnp.asarray(vim), generation_config=gen_cfg,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_classify_identical_with_features(world):
    cfg, model, variables, make_videos, make_prompt = world
    pixel = make_videos(2, 4)
    ids, vim = make_prompt(2, 4, 4)
    classes = np.asarray([[7, 8, 9], [10, 11, 1]])
    cls_mask = np.asarray([[1, 1, 1], [1, 1, 0]])
    want = classify(
        model, variables,
        prompt_input_ids=jnp.asarray(ids), class_input_ids=jnp.asarray(classes),
        pixel_values=jnp.asarray(pixel), prompt_video_input_mask=jnp.asarray(vim),
        class_attention_mask=jnp.asarray(cls_mask),
    )
    cache = VideoFeatureCache(model, variables)
    feats = cache.features(["x", "y"], pixel)
    got = classify(
        model, variables,
        prompt_input_ids=jnp.asarray(ids), class_input_ids=jnp.asarray(classes),
        video_features=feats, prompt_video_input_mask=jnp.asarray(vim),
        class_attention_mask=jnp.asarray(cls_mask),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    # second call (e.g. the noun stage of icl_eval): all hits, no pixels needed
    feats2 = cache.features(["x", "y"])
    np.testing.assert_array_equal(np.asarray(feats2), np.asarray(feats))
    assert cache.hits == 2 and cache.misses == 2


def test_hits_in_call_dedup_and_eviction(world):
    cfg, model, variables, make_videos, _ = world
    pixel = make_videos(4, 5)
    cache = VideoFeatureCache(model, variables, capacity=2, bucket=2)

    # duplicate key within one call is encoded once and counted as a hit
    dup_pixel = np.concatenate([pixel[:1], pixel[:1], pixel[1:2]])
    feats = cache.features(["a", "a", "b"], dup_pixel)
    assert feats.shape[0] == 3 * cfg.num_query_tokens
    np.testing.assert_array_equal(
        np.asarray(feats[: cfg.num_query_tokens]),
        np.asarray(feats[cfg.num_query_tokens : 2 * cfg.num_query_tokens]),
    )
    assert cache.misses == 2 and cache.hits == 1 and len(cache) == 2

    # capacity < call size: assembly must survive mid-call eviction
    want = _direct_features(model, variables, pixel)
    got = cache.features(["c", "d", "e", "f"], pixel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
    assert len(cache) == 2 and cache.evictions == 4  # a, b, then c, d

    # LRU order: e, f remain
    cache.features(["e", "f"])
    assert cache.hits == 3  # +2


def test_features_validation(world):
    cfg, model, variables, make_videos, _ = world
    cache = VideoFeatureCache(model, variables)
    with pytest.raises(ValueError, match="pixel_values or loader is required"):
        cache.features(["nope"])
    with pytest.raises(ValueError, match="videos for"):
        cache.features(["a", "b"], make_videos(1, 6))
    with pytest.raises(ValueError, match="capacity"):
        VideoFeatureCache(model, variables, capacity=0)
    with pytest.raises(ValueError, match="bucket"):
        VideoFeatureCache(model, variables, bucket=0)


def test_loader_fetches_only_misses(world):
    """The lazy ``loader=`` path skips host frame IO for cache hits: only
    missed keys are loaded, and the result is identical to the pixel path."""
    cfg, model, variables, make_videos, _ = world
    pixel = make_videos(4, 7)
    videos = {f"v{i}": pixel[i] for i in range(4)}
    loads: list[str] = []

    def loader(key):
        loads.append(key)
        return videos[key]

    cache = VideoFeatureCache(model, variables, bucket=2)
    got = cache.features(list(videos), loader=loader)
    want = _direct_features(model, variables, pixel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
    assert loads == list(videos)  # all four missed -> all four loaded

    # warm call: nothing loaded, features bit-identical to the first call
    loads.clear()
    again = cache.features(list(videos), loader=loader)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(got))
    assert loads == []

    # partial hit: only the new key is loaded
    videos["v4"] = make_videos(1, 8)[0]
    mixed = cache.features(["v1", "v4", "v2"], loader=loader)
    assert loads == ["v4"]
    assert mixed.shape[0] == 3 * cfg.num_query_tokens


def test_loader_with_preprocess_matches_pixel_path(world):
    """Raw uint8 frames through the per-bucket device preprocess produce the
    same features as preprocessing the whole batch up front (the CLI's
    non-cache path)."""
    from eilev_tpu.ops.preprocess import process_videos

    cfg, model, variables, make_videos, _ = world
    img = cfg.vision_config.image_size
    raw = np.random.default_rng(9).integers(
        0, 256, size=(3, 3, 2, 2 * img, 2 * img), dtype=np.uint8
    )
    processed = process_videos(
        jnp.asarray(raw), height=img, width=img, dtype=jnp.float32
    )
    want = _direct_features(model, variables, processed)

    cache = VideoFeatureCache(
        model,
        variables,
        bucket=2,
        preprocess=lambda px: process_videos(
            px, height=img, width=img, dtype=jnp.float32
        ),
    )
    got = cache.features(["a", "b", "c"], loader=lambda k: raw["abc".index(k)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
