#!/usr/bin/env python
"""Continuous-batching narration serving over a presampled in-context map.

The reference has no serving story beyond static batches (its demo and
generate_narration_texts.py run one fixed batch end to end, so a request
arriving mid-batch waits for the whole batch). This CLI drives the
TPU-native iteration-level scheduler (eilev_tpu/serving/engine.py): requests
arrive on an open-loop clock (--arrival_rate), admit into fixed-shape cache
slots at decode-chunk boundaries, and complete independently — the
production pattern for interactive narration serving.

Outputs the same CSV schema as generate_narration_texts.py (greedy decoding
is token-identical per request) plus one JSON line of serving metrics:
request latency p50/p95, time-to-first-chunk, and sustained videos/sec.
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import argparse
import csv
import json
import random
import time

import jax.numpy as jnp
import numpy as np

PROMPT = "Question: What is the camera wearer doing? Answer:"


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--processor", default=None)
    p.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--eval_frames_dir", required=True)
    p.add_argument("--in_context_query_map_file", required=True)
    p.add_argument("--in_context_example_frames_dir", required=True)
    p.add_argument("--eval_annotation_file", default=None)
    p.add_argument("--in_context_example_annotation_file", default=None)
    p.add_argument("--num_eval_datapoints", type=int, default=None)
    p.add_argument("--max_new_tokens", type=int, default=32)
    p.add_argument("--max_slots", type=int, default=4)
    p.add_argument("--max_len", type=int, default=2048)
    p.add_argument("--chunk_tokens", type=int, default=8)
    p.add_argument("--prefill_bucket", type=int, default=128)
    p.add_argument("--max_prompt_len", type=int, default=2048,
                   help="T5 engines: width of the per-slot cross-K/V buffers "
                        "(seq2seq prompts never enter the shared self cache)")
    p.add_argument("--draft", choices=["prompt_lookup"], default=None,
                   help="per-slot speculative decoding in the engine: each "
                        "slot drafts from its own prompt+emitted corpus and "
                        "advances by its OWN acceptance (greedy decoder-only "
                        "engines; token-identical to plain serving)")
    p.add_argument("--draft_gamma", type=int, default=8,
                   help="speculative window: drafted tokens per verify pass")
    p.add_argument("--draft_match_len", type=int, default=3,
                   help="longest n-gram tail tried by the prompt-lookup matcher")
    p.add_argument("--arrival_rate", type=float, default=0.0,
                   help="requests/sec (open loop, exponential gaps, seed "
                        "--random_seed); 0 = submit everything up front")
    p.add_argument("--vision_chunks", type=int, default=1)
    p.add_argument("--vision_cache", type=int, default=0,
                   help="LRU video-feature cache capacity (videos), keyed by "
                        "frame_path: recurring in-context videos skip the "
                        "vision tower (0 = off)")
    p.add_argument("--model_parallel", type=int, default=0,
                   help="shard the model weights over N devices (tensor parallel);"
                   " 0/1 = replicated")
    p.add_argument("--int8_lm", action="store_true")
    p.add_argument("--int8_kv", action="store_true")
    p.add_argument("--int8_vision", action="store_true")
    p.add_argument("--int8_qformer", action="store_true")
    p.add_argument("--w8a8_prefill", action="store_true")
    p.add_argument("--fast_gelu", action="store_true")
    p.add_argument("--random_seed", type=int, default=42)
    p.add_argument("--compilation_cache", default=None,
                   help="persistent XLA compilation cache dir (also "
                        "EILEV_COMPILATION_CACHE): replica restarts skip the "
                        "flagship-program XLA compiles (docs/PERF.md)")
    p.add_argument("--output_csv", required=True)
    return p.parse_args()


def main():
    args = parse_args()
    if args.compilation_cache:
        from eilev_tpu.utils import enable_compilation_cache

        enable_compilation_cache(args.compilation_cache)
    from eilev_tpu.data.collate import DataCollatorForInterleavedVideoSeq2Seq
    from eilev_tpu.data.frame import FrameInterleavedPresampledDataset
    from eilev_tpu.data.prompts import generate_input_ids_and_labels_from_interleaved
    from eilev_tpu.data.text import clean_narration_text
    from eilev_tpu.generation import GenerationConfig
    from eilev_tpu.models.auto import load_model, load_tokenizer
    from eilev_tpu.ops.preprocess import process_videos
    from eilev_tpu.serving import ContinuousBatchingEngine, Request

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.fast_gelu:
        from eilev_tpu.ops.gelu import set_gelu_impl

        set_gelu_impl("fast")
    model, variables, config = load_model(
        args.model, dtype=dtype, int8_lm=args.int8_lm, int8_kv=args.int8_kv,
        int8_vision=args.int8_vision, int8_qformer=args.int8_qformer,
        w8a8_prefill=args.w8a8_prefill,
    )
    tokenizer = load_tokenizer(args.processor or args.model)
    if args.model_parallel and args.model_parallel > 1:
        import jax

        from eilev_tpu.ops.attention import set_default_attention_impl
        from eilev_tpu.parallel import make_mesh, shard_variables_for_inference

        mesh = make_mesh(
            data=jax.device_count() // args.model_parallel, model=args.model_parallel
        )
        variables = shard_variables_for_inference(variables, mesh)
        # Pallas kernels are single-device programs; the XLA path shards cleanly.
        set_default_attention_impl("xla")
    # both families serve: OPT admits into the shared self cache, T5 into
    # per-slot cross-K/V buffers (serving/engine.py round 4)
    decoder_only = config.use_decoder_only_language_model

    def preprocess(datapoint):
        items = datapoint["items"]
        inputs = generate_input_ids_and_labels_from_interleaved(
            tokenizer,
            [(PROMPT + " " + clean_narration_text(i["narration_text"]), 1) for i in items[:-1]]
            + [(PROMPT, 1)],
            None,
            config.num_query_tokens,
            decoder_only,
        )
        query = items[-1]
        out = {
            "narration_text": clean_narration_text(query["narration_text"]),
            "frame_path": query["frame_path"],
            "video_uid": query["video_uid"],
            "clip_index": query["clip_index"],
            "in_context_frame_paths": [i["frame_path"] for i in items[:-1]],
            **inputs,
        }
        if "video" in items[0]:
            out["pixel_values"] = np.stack([i["video"] for i in items])
        return out

    # with the feature cache, frames are fetched LAZILY for cache misses only
    # (host PNG decode is the measured input bottleneck — docs/PERF.md)
    dataset = FrameInterleavedPresampledDataset(
        args.eval_frames_dir,
        args.in_context_query_map_file,
        args.in_context_example_frames_dir,
        annotation_file=args.eval_annotation_file,
        in_context_example_annotation_file=args.in_context_example_annotation_file,
        transform=preprocess,
        return_frames=not args.vision_cache,
        rng=random.Random(args.random_seed),
    )
    gen_cfg = GenerationConfig(
        max_new_tokens=args.max_new_tokens, pad_token_id=tokenizer.pad_token_id
    )
    if gen_cfg.eos_token_id is None:  # model-default eos, like generate()
        gen_cfg = gen_cfg.with_eos(config.text_config.eos_token_id)

    feature_cache = None
    feature_loader = None
    if args.vision_cache:
        from eilev_tpu.data.frame import FrameDataset
        from eilev_tpu.serving import VideoFeatureCache

        _img = config.vision_config.image_size
        feature_cache = VideoFeatureCache(
            model, variables, capacity=args.vision_cache,
            bucket=max(args.vision_chunks, 1) * 8,
            preprocess=lambda px: process_videos(
                px, height=_img, width=_img, dtype=dtype
            ),
        )
        _ctx_raw = FrameDataset(
            args.in_context_example_frames_dir,
            annotation_file=args.in_context_example_annotation_file,
        )
        _eval_raw = FrameDataset(
            args.eval_frames_dir, annotation_file=args.eval_annotation_file
        )

        def feature_loader(key):
            ds = _ctx_raw if key in _ctx_raw.dict_data else _eval_raw
            return ds[key]["video"]

    engine = ContinuousBatchingEngine(
        model, variables, gen_cfg,
        max_slots=args.max_slots, max_len=args.max_len,
        chunk_tokens=args.chunk_tokens, prefill_bucket=args.prefill_bucket,
        max_prompt_len=args.max_prompt_len,
        vision_chunks=args.vision_chunks, feature_cache=feature_cache,
        feature_loader=feature_loader,
        speculative=args.draft, spec_gamma=args.draft_gamma,
        spec_match_len=args.draft_match_len,
    )

    n = len(dataset) if args.num_eval_datapoints is None else min(
        args.num_eval_datapoints, len(dataset)
    )
    img = config.vision_config.image_size
    arrival_rng = random.Random(args.random_seed)
    t0 = time.perf_counter()
    arrivals, gap = [], 0.0
    for i in range(n):
        arrivals.append(gap)
        if args.arrival_rate > 0:
            gap += arrival_rng.expovariate(args.arrival_rate)

    meta: dict[int, dict] = {}
    submit_t: dict[int, float] = {}
    done: dict[int, object] = {}
    latency: dict[int, float] = {}
    pending = list(range(n))
    videos_per_request = None
    while pending or not engine.idle:
        now = time.perf_counter() - t0
        for i in [i for i in pending if arrivals[i] <= now]:
            feats = dataset[i]
            pixel = None
            if feature_cache is None:
                pixel = np.asarray(
                    process_videos(
                        jnp.asarray(feats["pixel_values"]), height=img, width=img, dtype=dtype
                    )
                )
            keys = [*feats["in_context_frame_paths"], feats["frame_path"]]
            videos_per_request = len(keys)
            rid = engine.submit(
                Request(
                    input_ids=np.asarray(feats["input_ids"]),
                    pixel_values=pixel,
                    video_input_mask=np.asarray(feats["video_input_mask"]),
                    feature_keys=keys if feature_cache is not None else None,
                )
            )
            meta[rid] = feats
            submit_t[rid] = time.perf_counter() - t0
            pending.remove(i)
        if pending and engine.idle and arrivals[min(pending)] > now:
            time.sleep(min(0.01, arrivals[min(pending)] - now))
            continue
        for c in engine.step():
            done[c.rid] = c
            latency[c.rid] = (time.perf_counter() - t0) - submit_t[c.rid]
    wall = time.perf_counter() - t0

    with open(args.output_csv, "w", newline="") as f:
        writer = csv.DictWriter(
            f,
            fieldnames=[
                "frame_path", "video_uid", "clip_index", "generated",
                "ground_truth", "in_context_frame_paths",
            ],
        )
        writer.writeheader()
        for rid in sorted(done):
            m = meta[rid]
            text = tokenizer.decode(done[rid].tokens, skip_special_tokens=True)
            writer.writerow(
                {
                    "frame_path": m["frame_path"],
                    "video_uid": m["video_uid"],
                    "clip_index": m["clip_index"],
                    "generated": text.strip(),
                    "ground_truth": m["narration_text"],
                    "in_context_frame_paths": "|".join(m["in_context_frame_paths"]),
                }
            )

    lats = sorted(latency.values())

    def pct(q: float):
        return round(lats[min(len(lats) - 1, int(len(lats) * q))], 3) if lats else None

    metrics = {
        "requests": n,
        "wall_sec": round(wall, 3),
        "videos_per_sec": round(n * (videos_per_request or 0) / wall, 3),
        "latency_p50_sec": round(lats[len(lats) // 2], 3) if lats else None,
        "latency_p95_sec": pct(0.95),
        "latency_p99_sec": pct(0.99),
        "latency_max_sec": round(lats[-1], 3) if lats else None,
        # cache-pressure events: compactions are the rolling reclaim (no
        # stall); resets only ever fire on an EMPTY engine (free)
        "cache_compactions": engine.stats["compactions"],
        "cache_resets": engine.stats["resets"],
        "arrival_rate": args.arrival_rate,
        "max_slots": args.max_slots,
        "chunk_tokens": args.chunk_tokens,
    }
    if args.draft:
        # realized speculative advance: emitted tokens per live row per pass
        metrics["spec_tokens_per_pass"] = round(
            engine.stats["spec_tokens"] / max(engine.stats["spec_rows"], 1), 3
        )
        metrics["spec_passes"] = engine.stats["spec_passes"]
        metrics["spec_fallback_chunks"] = engine.stats["spec_fallback_chunks"]
        metrics["evictions"] = engine.stats["evictions"]
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
