#!/usr/bin/env python
"""Serving engine under sustained saturation at the flagship geometry.

Round-3 verdict weak #4: the engine's cache-pressure behavior had never been
measured under load long enough to cross multiple reclaim events. This
drives the 2.7B engine with every request submitted up front (a closed
backlog = the worst sustained load), enough requests that the shared cache
index crosses its limit repeatedly, and reports request-latency
p50/p95/p99/max plus the cache-pressure counters. With round 4's rolling
compaction the pressure events are O(cache-roll) reclaims, not
drain-everything stalls; the compaction cost itself is timed separately.

Vision runs through a prewarmed VideoFeatureCache (the serving operating
point: in-context videos recur across requests, only the query video is
new), so the measured stream is admission-prefill + chunked decode — the
phases the engine actually schedules.

Env: N_REQUESTS (default 24), MAX_SLOTS (4), MAX_LEN (2048), CHUNK (8),
PREFILL_BUCKET (128), MAX_NEW (32).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from bench import FRAMES, SHOTS, build_prompt, random_bf16_params
    from eilev_tpu import configs
    from eilev_tpu.generation import GenerationConfig
    from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration as VB
    from eilev_tpu.ops.preprocess import process_videos
    from eilev_tpu.serving import ContinuousBatchingEngine, Request, VideoFeatureCache
    from eilev_tpu.serving.engine import _compact_cache

    n_requests = int(os.environ.get("N_REQUESTS", "24"))
    max_slots = int(os.environ.get("MAX_SLOTS", "4"))
    max_len = int(os.environ.get("MAX_LEN", "2048"))
    chunk = int(os.environ.get("CHUNK", "8"))
    bucket = int(os.environ.get("PREFILL_BUCKET", "128"))
    max_new = int(os.environ.get("MAX_NEW", "32"))

    cfg = configs.blip2_opt_2_7b()
    model = VB(cfg, dtype=jnp.bfloat16)
    ids, mask, vim = build_prompt(cfg, 1)
    v = SHOTS + 1
    img = cfg.vision_config.image_size
    example = {
        "input_ids": jax.ShapeDtypeStruct(ids.shape, jnp.int32),
        "pixel_values": jax.ShapeDtypeStruct((v, 3, FRAMES, img, img), jnp.bfloat16),
        "video_input_mask": jax.ShapeDtypeStruct(vim.shape, jnp.int32),
    }
    params = random_bf16_params(model, example)
    variables = {"params": params}

    gen_cfg = GenerationConfig(max_new_tokens=max_new, pad_token_id=1)
    # NO eos: every request decodes the full max_new budget -> worst-case
    # sustained cache growth (real narrations stop at ~10 tokens)
    rng_np = np.random.default_rng(0)
    frames_u8 = rng_np.integers(0, 256, size=(1, 3, FRAMES, img, img), dtype=np.uint8)

    def loader(key):
        return frames_u8[0]

    cache = VideoFeatureCache(
        model, variables, capacity=SHOTS + n_requests + 4, bucket=8,
        preprocess=lambda px: process_videos(px, height=img, width=img, dtype=jnp.bfloat16),
    )
    eng = ContinuousBatchingEngine(
        model, variables, gen_cfg, max_slots=max_slots, max_len=max_len,
        chunk_tokens=chunk, prefill_bucket=bucket,
        feature_cache=cache, feature_loader=loader,
    )

    # shared 16-video context pool + unique query per request (the icl_eval
    # steady state: 94% hit rate)
    context_keys = [f"ctx-{i}" for i in range(SHOTS)]
    requests = []
    for i in range(n_requests):
        requests.append(
            Request(
                input_ids=np.asarray(ids[0]),
                pixel_values=None,
                video_input_mask=np.asarray(vim[0]),
                feature_keys=[*context_keys, f"query-{i}"],
            )
        )

    # warmup: one request end to end (compiles admit/decode programs and
    # warms the shared context features)
    eng.run([
        Request(
            input_ids=np.asarray(ids[0]),
            pixel_values=None,
            video_input_mask=np.asarray(vim[0]),
            feature_keys=[*context_keys, "warmup-query"],
        )
    ])

    t0 = time.perf_counter()
    submit_t = {}
    lat = {}
    rids = []
    for r in requests:
        rid = eng.submit(r)
        rids.append(rid)
        submit_t[rid] = 0.0  # all submitted at t0: closed backlog
    while not eng.idle:
        for c in eng.step():
            lat[c.rid] = time.perf_counter() - t0
    wall = time.perf_counter() - t0

    lats = sorted(lat[r] for r in rids)

    def pct(q):
        return round(lats[min(len(lats) - 1, int(len(lats) * q))], 3)

    # cost of one compaction at this cache size, timed in isolation
    tcomp = []
    for _ in range(3):
        t1 = time.perf_counter()
        eng._cache = _compact_cache(eng._cache, jnp.asarray(0, jnp.int32))
        float(np.asarray(eng._cache["index"]))
        tcomp.append(time.perf_counter() - t1)

    print(json.dumps({
        "requests": n_requests,
        "max_slots": max_slots, "max_len": max_len, "chunk_tokens": chunk,
        "wall_sec": round(wall, 2),
        "videos_per_sec": round(n_requests * v / wall, 2),
        "requests_per_sec": round(n_requests / wall, 3),
        "latency_p50_sec": pct(0.50),
        "latency_p95_sec": pct(0.95),
        "latency_p99_sec": pct(0.99),
        "latency_max_sec": round(lats[-1], 3),
        "cache_compactions": eng.stats["compactions"],
        "cache_resets": eng.stats["resets"],
        "compaction_cost_sec": round(float(np.median(tcomp)), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
