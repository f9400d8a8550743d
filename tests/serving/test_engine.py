"""Continuous-batching engine (eilev_tpu/serving/engine.py).

The load-bearing guarantee: per-request outputs are TOKEN-IDENTICAL to
isolated ``generate`` calls, no matter when the request was admitted, which
slot it landed in, how much left-padding the shared bucketed index forced,
or whether the session was flushed and reset in between.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig, generate
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.serving import Completion, ContinuousBatchingEngine, Request


@pytest.fixture(scope="module")
def world():
    cfg = configs.tiny_config(text_model="opt")
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b, t, s = 1, 2, 14
    img = cfg.vision_config.image_size
    q = cfg.num_query_tokens

    def make_request(seed, extra_text=0):
        r = np.random.default_rng(seed)
        p = s + extra_text
        ids = r.integers(4, cfg.text_config.vocab_size, size=(p,))
        vim = np.zeros((p,), np.int64)
        vim[1 : 1 + q] = 1
        pixel = r.normal(size=(1, 3, t, img, img)).astype(np.float32)
        return Request(input_ids=ids, pixel_values=pixel, video_input_mask=vim)

    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(make_request(0).input_ids[None]),
        pixel_values=jnp.asarray(make_request(0).pixel_values),
        video_input_mask=jnp.asarray(make_request(0).video_input_mask[None]),
    )["params"]
    return cfg, model, {"params": params}, make_request


def _reference_rows(model, variables, gen_cfg, requests):
    rows = []
    for r in requests:
        rows.append(
            np.asarray(
                generate(
                    model,
                    variables,
                    input_ids=jnp.asarray(r.input_ids[None]),
                    pixel_values=jnp.asarray(r.pixel_values),
                    video_input_mask=jnp.asarray(r.video_input_mask[None]),
                    generation_config=gen_cfg,
                )
            )[0]
        )
    return rows


def test_engine_batch_matches_isolated_generate(world):
    cfg, model, variables, make_request = world
    gen_cfg = GenerationConfig(max_new_tokens=6, pad_token_id=1)
    requests = [make_request(seed, extra_text=seed % 3) for seed in range(4)]
    ref = _reference_rows(model, variables, gen_cfg, requests)

    eng = ContinuousBatchingEngine(
        model, variables, gen_cfg, max_slots=2, max_len=96,
        chunk_tokens=3, prefill_bucket=16,
    )
    done = eng.run([dataclasses.replace(r) for r in requests])
    assert sorted(done) == [0, 1, 2, 3]
    for rid, completion in done.items():
        np.testing.assert_array_equal(completion.tokens, ref[rid], err_msg=str(rid))


@pytest.mark.slow
def test_engine_mixed_video_geometry(world):
    """Requests with DIFFERENT video counts (0/1/2/4 videos) serve through
    ONE engine, token-identical to isolated generate — the demo/chat
    workload (variable videos per turn, demo/eilev_demo.py). video_bucket=2
    routes every cold vision encode through one fixed-size compiled program
    (the feature-cache miss scheme) regardless of per-request count."""
    cfg, model, variables, _ = world
    q = cfg.num_query_tokens
    t = 2
    img = cfg.vision_config.image_size

    def make_nvideo_request(seed, n_videos):
        r = np.random.default_rng(seed)
        p = 6 + n_videos * (q + 1)
        ids = r.integers(4, cfg.text_config.vocab_size, size=(p,))
        vim = np.zeros((p,), np.int64)
        for i in range(n_videos):
            vim[1 + i * (q + 1) : 1 + i * (q + 1) + q] = 1
        if n_videos == 0:
            return Request(input_ids=ids, pixel_values=None, video_input_mask=None)
        pixel = r.normal(size=(n_videos, 3, t, img, img)).astype(np.float32)
        return Request(input_ids=ids, pixel_values=pixel, video_input_mask=vim)

    gen_cfg = GenerationConfig(max_new_tokens=5, pad_token_id=1)
    requests = [
        make_nvideo_request(31, 1),
        make_nvideo_request(32, 4),
        make_nvideo_request(33, 0),
        make_nvideo_request(34, 2),
        make_nvideo_request(35, 4),
    ]
    ref = []
    for r in requests:
        kw = dict(
            input_ids=jnp.asarray(r.input_ids[None]),
            generation_config=gen_cfg,
        )
        if r.pixel_values is not None:
            kw["pixel_values"] = jnp.asarray(r.pixel_values)
            kw["video_input_mask"] = jnp.asarray(r.video_input_mask[None])
        ref.append(np.asarray(generate(model, variables, **kw))[0])

    for bucket in (0, 2):
        eng = ContinuousBatchingEngine(
            model, variables, gen_cfg, max_slots=2, max_len=96,
            chunk_tokens=3, prefill_bucket=8, video_bucket=bucket,
        )
        done = eng.run([dataclasses.replace(r) for r in requests])
        for rid in range(5):
            np.testing.assert_array_equal(
                done[rid].tokens, ref[rid], err_msg=f"bucket={bucket} rid={rid}"
            )


@pytest.mark.slow
def test_engine_staggered_arrivals_match(world):
    """Requests arriving mid-decode (different chunks, reused slots) still
    reproduce the isolated outputs exactly."""
    cfg, model, variables, make_request = world
    gen_cfg = GenerationConfig(max_new_tokens=5, pad_token_id=1)
    requests = [make_request(10 + seed, extra_text=seed % 4) for seed in range(5)]
    ref = _reference_rows(model, variables, gen_cfg, requests)

    eng = ContinuousBatchingEngine(
        model, variables, gen_cfg, max_slots=2, max_len=128,
        chunk_tokens=2, prefill_bucket=16,
    )
    arrival = {0: 0, 1: 0, 2: 1, 3: 2, 4: 4}  # rid -> chunk of submission
    done: dict[int, Completion] = {}
    chunk = 0
    pending = list(range(5))
    while pending or not eng.idle:
        for rid in [r for r in pending if arrival[r] <= chunk]:
            got = eng.submit(dataclasses.replace(requests[rid]))
            assert got == rid
            pending.remove(rid)
        for c in eng.step():
            done[c.rid] = c
        chunk += 1
        assert chunk < 200
    for rid in range(5):
        np.testing.assert_array_equal(done[rid].tokens, ref[rid], err_msg=str(rid))
        assert done[rid].admitted_at_chunk >= arrival[rid]


def test_engine_session_flush_and_reset(world):
    """A max_len too small for all requests at once forces a drain+reset; the
    post-reset session still produces identical tokens."""
    cfg, model, variables, make_request = world
    gen_cfg = GenerationConfig(max_new_tokens=4, pad_token_id=1)
    requests = [make_request(20 + seed) for seed in range(3)]
    ref = _reference_rows(model, variables, gen_cfg, requests)

    eng = ContinuousBatchingEngine(
        model, variables, gen_cfg, max_slots=1, max_len=24,
        chunk_tokens=2, prefill_bucket=8,
    )
    done = eng.run([dataclasses.replace(r) for r in requests])
    for rid in range(3):
        np.testing.assert_array_equal(done[rid].tokens, ref[rid], err_msg=str(rid))


@pytest.mark.slow
def test_engine_rolling_compaction_no_drain(world):
    """Round 4: cache pressure triggers COMPACTION (uniform left-shift of the
    dead prefix), not a drain — outputs stay token-identical, at least one
    compaction fires, and with continuously overlapping work no global reset
    happens (the round-3 drain-and-reset stalled every live request)."""
    cfg, model, variables, make_request = world
    gen_cfg = GenerationConfig(max_new_tokens=4, pad_token_id=1)
    requests = [make_request(40 + seed, extra_text=seed % 2) for seed in range(8)]
    ref = _reference_rows(model, variables, gen_cfg, requests)

    # 2 slots, max_len just big enough for ~2 concurrent windows: steady
    # submissions force repeated cache pressure while a row is always live
    eng = ContinuousBatchingEngine(
        model, variables, gen_cfg, max_slots=2, max_len=32,
        chunk_tokens=2, prefill_bucket=8,
    )
    done: dict[int, Completion] = {}
    pending = list(range(8))
    chunk = 0
    while pending or not eng.idle:
        # keep the queue topped up so slots never all drain
        while pending and len(eng._queue) < 2:
            eng.submit(dataclasses.replace(requests[pending.pop(0)]))
        for c in eng.step():
            done[c.rid] = c
        chunk += 1
        assert chunk < 300
    for rid in range(8):
        np.testing.assert_array_equal(done[rid].tokens, ref[rid], err_msg=str(rid))
    assert eng.stats["compactions"] >= 1, eng.stats
    assert eng.stats["resets"] == 0, eng.stats


@pytest.fixture(scope="module")
def t5_world():
    cfg = configs.tiny_config(text_model="t5")
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.float32)
    t, s = 2, 14
    img = cfg.vision_config.image_size
    q = cfg.num_query_tokens

    def make_request(seed, extra_text=0):
        r = np.random.default_rng(seed)
        p = s + extra_text
        ids = r.integers(4, cfg.text_config.vocab_size, size=(p,))
        vim = np.zeros((p,), np.int64)
        vim[1 : 1 + q] = 1
        pixel = r.normal(size=(1, 3, t, img, img)).astype(np.float32)
        return Request(input_ids=ids, pixel_values=pixel, video_input_mask=vim)

    first = make_request(0)
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(first.input_ids[None]),
        pixel_values=jnp.asarray(first.pixel_values),
        video_input_mask=jnp.asarray(first.video_input_mask[None]),
        labels=jnp.asarray(np.zeros((1, 3), np.int64)),
    )["params"]
    return cfg, model, {"params": params}, make_request


@pytest.mark.slow
def test_engine_t5_batch_matches_isolated_generate(t5_world):
    """Round 4: the encoder-decoder family serves through the same scheduler.
    Engine completions are the NEW tokens (isolated seq2seq generate prepends
    decoder_start_token_id — HF contract)."""
    cfg, model, variables, make_request = t5_world
    gen_cfg = GenerationConfig(
        max_new_tokens=6, pad_token_id=cfg.text_config.pad_token_id
    )
    requests = [make_request(seed, extra_text=seed % 3) for seed in range(4)]
    ref = _reference_rows(model, variables, gen_cfg, requests)

    eng = ContinuousBatchingEngine(
        model, variables, gen_cfg, max_slots=2, max_len=32,
        chunk_tokens=3, prefill_bucket=8, max_prompt_len=24,
    )
    done = eng.run([dataclasses.replace(r) for r in requests])
    assert sorted(done) == [0, 1, 2, 3]
    for rid, completion in done.items():
        # ref[rid] = [start, tok_0, ..]; engine rows = [tok_0, ..] pad-filled
        want = np.full_like(completion.tokens, gen_cfg.pad_token_id)
        got_ref = ref[rid][1:]
        want[: len(got_ref)] = got_ref
        np.testing.assert_array_equal(completion.tokens, want, err_msg=str(rid))


@pytest.mark.slow
def test_engine_t5_staggered_and_compaction(t5_world):
    """Staggered T5 arrivals with a tight decoder cache: outputs stay exact
    through slot reuse and rolling compaction (relative bias is translation-
    invariant, so rows starting at arbitrary cache offsets are exact)."""
    cfg, model, variables, make_request = t5_world
    gen_cfg = GenerationConfig(
        max_new_tokens=4, pad_token_id=cfg.text_config.pad_token_id
    )
    requests = [make_request(60 + seed, extra_text=seed % 2) for seed in range(6)]
    ref = _reference_rows(model, variables, gen_cfg, requests)

    # chunk 3 vs max_new 4 staggers completions; the lone first submission
    # staggers admissions, so cache pressure always hits with a row LIVE -
    # exercising compaction (not the empty-engine reset)
    eng = ContinuousBatchingEngine(
        model, variables, gen_cfg, max_slots=2, max_len=12,
        chunk_tokens=3, prefill_bucket=8, max_prompt_len=24,
    )
    done: dict[int, Completion] = {}
    pending = list(range(6))
    eng.submit(dataclasses.replace(requests[pending.pop(0)]))
    for c in eng.step():
        done[c.rid] = c
    chunk = 0
    while pending or not eng.idle:
        while pending and len(eng._queue) < 2:
            eng.submit(dataclasses.replace(requests[pending.pop(0)]))
        for c in eng.step():
            done[c.rid] = c
        chunk += 1
        assert chunk < 300
    for rid in range(6):
        want = np.full_like(done[rid].tokens, gen_cfg.pad_token_id)
        got_ref = ref[rid][1:]
        want[: len(got_ref)] = got_ref
        np.testing.assert_array_equal(done[rid].tokens, want, err_msg=str(rid))
    assert eng.stats["compactions"] >= 1, eng.stats


def test_engine_t5_rejects_oversized_prompt(t5_world):
    cfg, model, variables, make_request = t5_world
    gen_cfg = GenerationConfig(
        max_new_tokens=4, pad_token_id=cfg.text_config.pad_token_id
    )
    eng = ContinuousBatchingEngine(
        model, variables, gen_cfg, max_slots=1, max_len=12,
        chunk_tokens=2, prefill_bucket=8, max_prompt_len=8,
    )
    eng.submit(make_request(99))  # prompt is 14 tokens > max_prompt_len=8
    with pytest.raises(ValueError, match="max_prompt_len"):
        eng.step()


def test_engine_rejects_oversized_prompt(world):
    cfg, model, variables, make_request = world
    gen_cfg = GenerationConfig(max_new_tokens=8, pad_token_id=1)
    eng = ContinuousBatchingEngine(
        model, variables, gen_cfg, max_slots=1, max_len=24,
        chunk_tokens=2, prefill_bucket=8,
    )
    big = make_request(30, extra_text=40)  # prompt 54 > 24 - 8
    eng.submit(big)
    with pytest.raises(ValueError, match="cannot fit"):
        eng.step()


@pytest.mark.slow
def test_engine_tensor_parallel_matches(world):
    """The engine under tensor-parallel sharded weights (parallel/mesh.py:
    shard_variables_for_inference) reproduces the isolated outputs exactly —
    the serving-side TP path (--model_parallel on scripts/serve.py)."""
    from eilev_tpu.parallel import make_mesh, shard_variables_for_inference

    cfg, model, variables, make_request = world
    gen_cfg = GenerationConfig(max_new_tokens=6, pad_token_id=1)
    requests = [make_request(seed, extra_text=seed % 3) for seed in range(3)]
    ref = _reference_rows(model, variables, gen_cfg, requests)

    mesh = make_mesh(data=4, model=2)
    tp_vars = shard_variables_for_inference(variables, mesh)
    eng = ContinuousBatchingEngine(
        model, tp_vars, gen_cfg, max_slots=2, max_len=96,
        chunk_tokens=3, prefill_bucket=16,
    )
    done = eng.run([dataclasses.replace(r) for r in requests])
    assert sorted(done) == [0, 1, 2]
    for rid, completion in done.items():
        np.testing.assert_array_equal(completion.tokens, ref[rid], err_msg=str(rid))


def test_engine_feature_cache_matches(world):
    """Requests routed through a VideoFeatureCache (shared in-context videos
    encode once) still reproduce the isolated pixel-path outputs exactly."""
    from eilev_tpu.serving import VideoFeatureCache

    cfg, model, variables, make_request = world
    gen_cfg = GenerationConfig(max_new_tokens=6, pad_token_id=1)
    requests = [make_request(40 + seed, extra_text=seed % 3) for seed in range(3)]
    # make requests 1 and 2 share request 0's video under a shared key
    shared = requests[0].pixel_values
    requests = [
        dataclasses.replace(r, pixel_values=shared, feature_keys=["shared"])
        for r in requests
    ]
    ref = _reference_rows(model, variables, gen_cfg, requests)

    cache = VideoFeatureCache(model, variables, bucket=2)
    eng = ContinuousBatchingEngine(
        model, variables, gen_cfg, max_slots=2, max_len=96,
        chunk_tokens=3, prefill_bucket=16, feature_cache=cache,
    )
    done = eng.run([dataclasses.replace(r) for r in requests])
    assert sorted(done) == [0, 1, 2]
    for rid, completion in done.items():
        np.testing.assert_array_equal(completion.tokens, ref[rid], err_msg=str(rid))
    assert cache.misses == 1 and cache.hits == 2  # the shared video encoded once


def test_engine_lazy_feature_loader_matches(world):
    """Requests with NO pixel_values: the engine's feature_loader fetches
    frames for cache misses only, outputs identical to the pixel path."""
    from eilev_tpu.serving import VideoFeatureCache

    cfg, model, variables, make_request = world
    gen_cfg = GenerationConfig(max_new_tokens=6, pad_token_id=1)
    requests = [make_request(60 + seed, extra_text=seed % 3) for seed in range(3)]
    ref = _reference_rows(model, variables, gen_cfg, requests)

    frames = {f"v{i}": r.pixel_values[0] for i, r in enumerate(requests)}
    loads: list[str] = []

    def loader(key):
        loads.append(key)
        return frames[key]

    cache = VideoFeatureCache(model, variables, bucket=2)
    eng = ContinuousBatchingEngine(
        model, variables, gen_cfg, max_slots=2, max_len=96,
        chunk_tokens=3, prefill_bucket=16,
        feature_cache=cache, feature_loader=loader,
    )
    lazy_requests = [
        dataclasses.replace(r, pixel_values=None, feature_keys=[f"v{i}"])
        for i, r in enumerate(requests)
    ]
    done = eng.run(lazy_requests)
    assert sorted(done) == [0, 1, 2]
    for rid, completion in done.items():
        np.testing.assert_array_equal(completion.tokens, ref[rid], err_msg=str(rid))
    assert loads == ["v0", "v1", "v2"]  # one host fetch per distinct video

    with pytest.raises(ValueError, match="feature_loader requires feature_cache"):
        ContinuousBatchingEngine(
            model, variables, gen_cfg, feature_loader=loader
        )


def test_engine_rejects_total_length_knobs(world):
    """max_length/min_length are HF total-length knobs generate() resolves
    per call; the engine budgets one shared max_new_tokens, so it must
    reject them loudly instead of over-budgeting (ADVICE r4)."""
    cfg, model, variables, make_request = world
    with pytest.raises(NotImplementedError, match="max_length"):
        ContinuousBatchingEngine(
            model, variables,
            GenerationConfig(max_new_tokens=4, max_length=64,
                             pad_token_id=cfg.text_config.pad_token_id),
            max_slots=2, max_len=128, prefill_bucket=16,
        )
    with pytest.raises(NotImplementedError, match="min_length"):
        ContinuousBatchingEngine(
            model, variables,
            GenerationConfig(max_new_tokens=4, min_length=8,
                             pad_token_id=cfg.text_config.pad_token_id),
            max_slots=2, max_len=128, prefill_bucket=16,
        )
