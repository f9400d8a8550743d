"""Vision-feature cache: eval throughput when in-context videos recur.

The flagship eval workload (16-shot ICL narration, reference
slurm-scripts/README.md:71-76) re-encodes all 17 videos of every datapoint.
But the 16 in-context videos are drawn from a shared example pool
(reference frame.py:179-266), and at steady state only the QUERY video is new.
serving/feature_cache.py caches per-video Q-Former features keyed by
frame_path; this measures what that buys end to end on one chip at flagship
geometry (batch 4 datapoints = 68 videos, 32 new tokens, bf16):

  cold      — every video new each batch (cache overhead vs the monolithic
              encode the headline bench uses)
  warm-ctx  — the 64 context videos hit a pre-warmed pool, only the 4 query
              videos encode (hit rate 64/68 = 94%)

BENCH_INT8=1 adds the COMBINED serving profile: the same warm-context loop
over the int8 weight-only LM (+ BENCH_INT8_KV / BENCH_INT8_VISION /
BENCH_FAST_GELU, like bench.py) — the cache removes the vision tower from
the steady state, so the int8 decode-stream savings stack on top of the
4.3x instead of being diluted by the (bf16-bound) vision share.

Usage: python benchmarks/vision_cache_bench.py  (BENCH_REPS=N to change reps)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import MAX_NEW_TOKENS, SHOTS, build_prompt, random_bf16_params
from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig
from eilev_tpu.generation.decoding import _greedy_sample_decoder_only
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration as VB
from eilev_tpu.ops.preprocess import process_videos
from eilev_tpu.serving import VideoFeatureCache

BATCH = int(os.environ.get("BENCH_BATCH", "4"))
FRAMES = 8
POOL = 256  # pre-warmed in-context example pool (capacity holds it whole)


def main() -> None:
    reps = int(os.environ.get("BENCH_REPS", "3"))
    print("devices:", jax.devices())
    if os.environ.get("BENCH_FAST_GELU", "0") == "1":
        from eilev_tpu.ops.gelu import set_gelu_impl

        set_gelu_impl("fast")
    cfg = configs.blip2_opt_2_7b()
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.bfloat16)
    v = BATCH * (SHOTS + 1)
    ids, mask, vim = build_prompt(cfg, BATCH)
    ids_d, mask_d, vim_d = (
        jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32), jnp.asarray(vim, jnp.int32),
    )
    example = {
        "input_ids": jax.ShapeDtypeStruct(ids.shape, jnp.int32),
        "pixel_values": jax.ShapeDtypeStruct((v, 3, FRAMES, 224, 224), jnp.bfloat16),
        "video_input_mask": jax.ShapeDtypeStruct(vim.shape, jnp.int32),
    }
    variables = {"params": random_bf16_params(model, example)}
    gen_cfg = GenerationConfig(max_new_tokens=MAX_NEW_TOKENS, pad_token_id=1, eos_token_id=(50118,))
    rng = jax.random.PRNGKey(0)

    pixel_u8 = jax.device_put(
        np.random.default_rng(1).integers(0, 256, size=(v, 3, FRAMES, 224, 224), dtype=np.uint8)
    )

    @jax.jit
    def baseline_step(variables, pixel_u8):
        pixel = process_videos(pixel_u8, dtype=jnp.bfloat16)
        embeds = model.apply(variables, ids_d, pixel, vim_d, method=VB.embed_and_scatter)
        return _greedy_sample_decoder_only(model, variables, embeds, mask_d, gen_cfg, rng)

    @jax.jit
    def decode_from_features(variables, feats):
        embeds = model.apply(
            variables, ids_d, None, vim_d, method=VB.embed_and_scatter, video_features=feats
        )
        return _greedy_sample_decoder_only(model, variables, embeds, mask_d, gen_cfg, rng)

    pixel_bf16 = jax.jit(lambda p: process_videos(p, dtype=jnp.bfloat16))

    def timed(fn, n):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n

    # BENCH_INT8_ONLY=1 skips the bf16 legs — at batch >= 8 the bf16 model
    # (weights + monolithic vision activations) oversubscribes HBM, which is
    # exactly the regime the int8+cache profile exists for
    int8_only = os.environ.get("BENCH_INT8_ONLY", "0") == "1"
    base = None
    cache = VideoFeatureCache(model, variables, capacity=POOL + 4096, bucket=4)
    counter = [0]

    if not int8_only:
        # -- baseline: the headline path (monolithic encode inside the step) -
        base = timed(lambda: np.asarray(baseline_step(variables, pixel_u8)), reps)
        print(f"baseline (no cache):        {base:6.3f} s/batch  {v/base:6.1f} videos/s")

        # -- cold: every key new (misses bucket through the cache) -----------
        def cold_step():
            keys = [f"cold{counter[0]}_{i}" for i in range(v)]
            counter[0] += 1
            feats = cache.features(keys, pixel_bf16(pixel_u8))
            return np.asarray(decode_from_features(variables, feats))

        cold = timed(cold_step, reps)
        print(f"cold cache (all miss):      {cold:6.3f} s/batch  {v/cold:6.1f} videos/s")

    # -- warm contexts: pre-warm a POOL of example videos, then per batch draw
    #    64 context keys from it; only the 4 query videos encode -------------
    pool_px = pixel_bf16(pixel_u8)
    draw = np.random.default_rng(7)

    if not int8_only:
        for s in range(0, POOL, v):
            n = min(v, POOL - s)
            cache.features([f"pool{s + i}" for i in range(n)], pool_px[:n])

        def warm_step():
            keys = []
            for b in range(BATCH):
                keys += [f"pool{k}" for k in draw.integers(0, POOL, size=SHOTS)]
                keys.append(f"q{counter[0]}_{b}")
            counter[0] += 1
            feats = cache.features(keys, pixel_bf16(pixel_u8))
            return np.asarray(decode_from_features(variables, feats))

        h0, m0 = cache.hits, cache.misses
        warm = timed(warm_step, reps)
        hits, misses = cache.hits - h0, cache.misses - m0
        rate = hits / max(hits + misses, 1)
        print(
            f"warm contexts (hit {rate:.0%}): {warm:6.3f} s/batch  {v/warm:6.1f} videos/s"
            f"  ({BATCH/warm:.2f} datapoints/s)"
        )
        print(f"speedup over baseline: cold {base/cold:.2f}x, warm {base/warm:.2f}x")

    if os.environ.get("BENCH_INT8", "0") != "1":
        return

    # -- combined serving profile: warm cache x int8 serving modes -----------
    import dataclasses
    import gc

    from eilev_tpu.ops.quantization import quantize_lm_params, quantize_vision_params

    int8_vision = os.environ.get("BENCH_INT8_VISION", "0") == "1"
    int8_qformer = os.environ.get("BENCH_INT8_QFORMER", "0") == "1"
    qcfg = configs.replace(
        cfg,
        text_config=dataclasses.replace(
            cfg.text_config,
            quantize_matmuls=True,
            int8_kv_cache=os.environ.get("BENCH_INT8_KV", "0") == "1",
            w8a8_prefill=os.environ.get("BENCH_W8A8_PREFILL", "0") == "1",
        ),
    )
    if int8_vision:
        qcfg = configs.replace(
            qcfg,
            vision_config=dataclasses.replace(qcfg.vision_config, quantize_matmuls=True),
        )
    if int8_qformer:
        qcfg = configs.replace(
            qcfg,
            qformer_config=dataclasses.replace(qcfg.qformer_config, quantize_matmuls=True),
        )
    qmodel = VideoBlipForConditionalGeneration(qcfg, dtype=jnp.bfloat16)

    @jax.jit
    def quantize(params):
        p = dict(params)
        p["language_model"] = quantize_lm_params(p["language_model"])
        if int8_vision:
            p["vision_model"] = quantize_vision_params(p["vision_model"])
        if int8_qformer:
            from eilev_tpu.ops.quantization import quantize_qformer_params

            p["qformer"] = quantize_qformer_params(p["qformer"])
        return p

    qvariables = {"params": quantize(variables["params"])}
    jax.block_until_ready(qvariables)
    # free the bf16 tree + its cached features before timing (HBM headroom)
    del variables, cache
    gc.collect()

    @jax.jit
    def decode_from_features_q(variables, feats):
        embeds = qmodel.apply(
            variables, ids_d, None, vim_d, method=VB.embed_and_scatter, video_features=feats
        )
        return _greedy_sample_decoder_only(qmodel, variables, embeds, mask_d, gen_cfg, rng)

    qcache = VideoFeatureCache(qmodel, qvariables, capacity=POOL + 4096, bucket=4)
    for s in range(0, POOL, v):
        n = min(v, POOL - s)
        qcache.features([f"pool{s + i}" for i in range(n)], pool_px[:n])

    def warm_step_q():
        keys = []
        for b in range(BATCH):
            keys += [f"pool{k}" for k in draw.integers(0, POOL, size=SHOTS)]
            keys.append(f"q{counter[0]}_{b}")
        counter[0] += 1
        feats = qcache.features(keys, pixel_bf16(pixel_u8))
        return np.asarray(decode_from_features_q(qvariables, feats))

    h0, m0 = qcache.hits, qcache.misses
    warm_q = timed(warm_step_q, reps)
    hits, misses = qcache.hits - h0, qcache.misses - m0
    rate = hits / max(hits + misses, 1)
    modes = "int8-lm" + ("+int8-kv" if qcfg.text_config.int8_kv_cache else "") + (
        "+w8a8-vision" if int8_vision else ""
    ) + ("+fast-gelu" if os.environ.get("BENCH_FAST_GELU", "0") == "1" else "")
    print(
        f"warm + {modes} (hit {rate:.0%}): {warm_q:6.3f} s/batch  "
        f"{v/warm_q:6.1f} videos/s  ({BATCH/warm_q:.2f} datapoints/s)"
    )
    if base is not None:
        print(f"combined speedup over bf16 baseline: {base/warm_q:.2f}x")


if __name__ == "__main__":
    main()
