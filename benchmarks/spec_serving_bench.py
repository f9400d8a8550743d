#!/usr/bin/env python
"""Per-slot speculative serving vs plain continuous batching, on-chip.

Three closed-backlog legs through the SAME engine geometry (2.7B flagship,
warm vision-feature cache, N requests over ``max_slots`` fixed cache slots):

  plain      — chunked single-token decode (the round-3 engine)
  spec_cold  — per-slot prompt-lookup speculation, corpus = each request's
               own prompt (random weights: acceptance only from accidental
               self-repeats; the honest lower bound)
  spec_echo  — each request additionally carries its own greedy continuation
               as ``Request.extra_corpus`` — the stand-in for the 16-shot
               narration workload, where generated narrations echo the
               in-context example narrations already sitting in the prompt
               (reference sampling by shared verb/noun, eilev/data/
               frame.py:179-266). The corpus/verify/accept machinery runs
               exactly as in production; only match quality is idealized,
               because random weights cannot produce echoing text.

Per-slot acceptance is the point: the static speculative path advances every
row by the MIN acceptance over the batch, so batching erases its win; the
engine advances each slot independently (serving/engine.py _spec_chunk).

Outputs one JSON line per leg: wall, videos/s, latency percentiles, realized
tokens/verify-pass, cache-pressure counters.

Env: N_REQUESTS (16), MAX_SLOTS (4), MAX_LEN (2048), CHUNK (8),
PREFILL_BUCKET (128), MAX_NEW (32), GAMMA (8), MATCH_LEN (3),
LEGS (comma list, default all three).
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

    n_requests = int(os.environ.get("N_REQUESTS", "16"))
    max_slots = int(os.environ.get("MAX_SLOTS", "4"))
    max_len = int(os.environ.get("MAX_LEN", "2048"))
    chunk = int(os.environ.get("CHUNK", "8"))
    bucket = int(os.environ.get("PREFILL_BUCKET", "128"))
    max_new = int(os.environ.get("MAX_NEW", "32"))
    gamma = int(os.environ.get("GAMMA", "8"))
    match_len = int(os.environ.get("MATCH_LEN", "3"))
    legs = os.environ.get("LEGS", "plain,spec_cold,spec_echo").split(",")

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

    # no eos: every request decodes the full budget (worst-case load; also
    # keeps the three legs comparable token for token)
    gen_cfg = GenerationConfig(max_new_tokens=max_new, pad_token_id=1)
    rng_np = np.random.default_rng(0)
    frames_u8 = rng_np.integers(0, 256, size=(1, 3, FRAMES, img, img), dtype=np.uint8)

    def loader(key):
        return frames_u8[0]

    cache = VideoFeatureCache(
        model, variables, capacity=SHOTS + n_requests + 4, bucket=8,
        preprocess=lambda px: process_videos(px, height=img, width=img, dtype=jnp.bfloat16),
    )
    context_keys = [f"ctx-{i}" for i in range(SHOTS)]

    def make_requests(extra_by_i=None):
        reqs = []
        for i in range(n_requests):
            reqs.append(
                Request(
                    input_ids=np.asarray(ids[0]),
                    pixel_values=None,
                    video_input_mask=np.asarray(vim[0]),
                    feature_keys=[*context_keys, f"query-{i}"],
                    extra_corpus=(
                        None if extra_by_i is None else extra_by_i[i]
                    ),
                )
            )
        return reqs

    def run_leg(name, speculative, extra_by_i=None):
        eng = ContinuousBatchingEngine(
            model, variables, gen_cfg, max_slots=max_slots, max_len=max_len,
            chunk_tokens=chunk, prefill_bucket=bucket,
            feature_cache=cache, feature_loader=loader,
            speculative=speculative, spec_gamma=gamma,
            spec_match_len=match_len,
            spec_extra_corpus=max_new if extra_by_i is not None else 0,
        )
        # warmup: compile admit/decode programs + warm the context features
        eng.run([
            Request(
                input_ids=np.asarray(ids[0]), pixel_values=None,
                video_input_mask=np.asarray(vim[0]),
                feature_keys=[*context_keys, "warmup-query"],
                extra_corpus=(
                    np.zeros(max_new, np.int64) if extra_by_i is not None else None
                ),
            )
        ])
        for k in eng.stats:
            eng.stats[k] = 0
        requests = make_requests(extra_by_i)
        t0 = time.perf_counter()
        lat = {}
        rids = [eng.submit(r) for r in requests]
        done = {}
        while not eng.idle:
            for c in eng.step():
                done[c.rid] = c
                lat[c.rid] = time.perf_counter() - t0
        wall = time.perf_counter() - t0
        lats = sorted(lat[r] for r in rids)

        def pct(q):
            return round(lats[min(len(lats) - 1, int(len(lats) * q))], 3)

        out = {
            "leg": name,
            "requests": n_requests,
            "max_slots": max_slots,
            "gamma": gamma if speculative else None,
            "wall_sec": round(wall, 2),
            "videos_per_sec": round(n_requests * v / wall, 2),
            "requests_per_sec": round(n_requests / wall, 3),
            "latency_p50_sec": pct(0.50),
            "latency_p95_sec": pct(0.95),
            "latency_max_sec": round(lats[-1], 3),
            "cache_compactions": eng.stats["compactions"],
            "evictions": eng.stats["evictions"],
        }
        if speculative:
            out["spec_tokens_per_pass"] = round(
                eng.stats["spec_tokens"] / max(eng.stats["spec_rows"], 1), 3
            )
            out["spec_passes"] = eng.stats["spec_passes"]
            out["spec_fallback_chunks"] = eng.stats["spec_fallback_chunks"]
        print(json.dumps(out), flush=True)
        return done

    plain_done = None
    if "plain" in legs:
        plain_done = run_leg("plain", None)
    if "spec_cold" in legs:
        run_leg("spec_cold", "prompt_lookup")
    if "spec_echo" in legs:
        if plain_done is None:
            plain_done = run_leg("plain", None)
        extra = {
            i: np.asarray(plain_done[rid].tokens, np.int64)
            for i, rid in enumerate(sorted(plain_done))
        }
        echo_done = run_leg("spec_echo", "prompt_lookup", extra_by_i=extra)
        # token identity across legs: speculation must not change the stream
        for (i, rid_e), rid_p in zip(
            enumerate(sorted(echo_done)), sorted(plain_done)
        ):
            np.testing.assert_array_equal(
                echo_done[rid_e].tokens, plain_done[rid_p].tokens
            )
        print(json.dumps({"token_identity_vs_plain": True}), flush=True)


if __name__ == "__main__":
    main()
