#!/usr/bin/env python
"""Batched narration generation over presampled in-context example maps.

CLI-parity target: /root/reference/scripts/general/generate_narration_texts.py -
left-padded batched generation with the fixed
'Question: What is the camera wearer doing? Answer:' prompt, outputting
(frame_path, video_uid, clip_index, generated, ground_truth,
in_context_frame_paths) rows.

TPU-native distribution: instead of one accelerate process per GPU with a
host-side gather_object (reference :124-153), the batch shards across the mesh's
"data" axis inside one jitted generate program; results come back as fixed-shape
token arrays (no object gathers, no end-of-dataloader duplicate trimming).
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))
# honor JAX_PLATFORMS even under the axon TPU plugin (which overrides the env var)
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

import jax.numpy as jnp
import numpy as np

PROMPT = "Question: What is the camera wearer doing? Answer:"


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--processor", default=None)
    p.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--vision_chunks", type=int, default=1,
                   help="run the ViT in N sequential chunks (bit-identical; "
                        "caps the activation peak for large --batch_size)")
    p.add_argument("--fast_gelu", action="store_true",
                   help="serving mode: tanh vision gelu (98.9%% bf16-"
                        "faithful, tower 66 -> 74%% MFU; ops/gelu.py)")
    p.add_argument("--int8_lm", action="store_true",
                   help="weight-only int8 LM serving path (faster decode; "
                        "near- but not bit-identical logits vs bf16)")
    p.add_argument("--int8_kv", action="store_true",
                   help="int8 KV cache via the Pallas VMEM-dequant decode "
                        "kernel (halves the cache stream; serving mode)")
    p.add_argument("--int8_qformer", action="store_true",
                   help="W8A8 Q-Former GEMMs on the int8 MXU path (serving "
                   "mode; NOT bit-parity)")
    p.add_argument("--w8a8_prefill", action="store_true",
                   help="with --int8_lm: run the LM prefill matmuls W8A8 on "
                   "the int8 MXU (decode keeps weight-only int8)")
    p.add_argument("--int8_vision", action="store_true",
                   help="W8A8 vision tower on the int8 MXU path (1.2-1.8x "
                        "measured on v5e; serving mode, not bit-parity)")
    p.add_argument("--model_parallel", type=int, default=0,
                   help="shard the model weights over N devices (tensor parallel"
                   " over the mesh 'model' axis); 0/1 = replicated")
    p.add_argument("--draft_layers", type=int, default=0,
                   help="> 0: token-identical speculative greedy decoding "
                        "with the first N layers self-drafting")
    p.add_argument("--draft_tokens", type=int, default=None,
                   help="draft tokens per verify pass (default 4 with "
                        "--draft_layers, 8 with --draft prompt_lookup whose "
                        "drafts are free)")
    p.add_argument("--draft", choices=("prompt_lookup",), default=None,
                   help="prompt_lookup: MODEL-FREE token-identical "
                        "speculative decoding — drafts come from n-gram "
                        "matches against the prompt + generated text "
                        "(measured 3.1x on the echo-heavy 16-shot workload "
                        "shape, docs/PERF.md)")
    p.add_argument("--draft_match_len", type=int, default=3,
                   help="longest n-gram tail tried by --draft prompt_lookup")
    p.add_argument("--vision_cache", type=int, default=0,
                   help="LRU video-feature cache capacity (videos), keyed by "
                        "frame_path: each distinct video runs the vision tower "
                        "once across the whole run (0 = off). In-context "
                        "examples recur across datapoints, so at steady state "
                        "only the query video is new.")
    p.add_argument("--eval_frames_dir", required=True)
    p.add_argument("--eval_annotation_file")
    p.add_argument("--in_context_query_map_file", required=True)
    p.add_argument("--in_context_example_frames_dir", required=True)
    p.add_argument("--in_context_example_annotation_file")
    p.add_argument("--batch_size", default=1, type=int)
    p.add_argument("--print_narration_texts", action="store_true")
    p.add_argument("--num_eval_datapoints", default=None, type=int)
    p.add_argument("--random_seed", type=int, default=42)
    p.add_argument("--generation_config", default='{"max_new_tokens": 512}')
    p.add_argument("--shuffle_in_context_example_frames", action="store_true")
    p.add_argument("--output_csv", required=True)
    p.add_argument("--wandb_project", default=None)
    return p.parse_args()


def main() -> None:
    args = parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    from eilev_tpu.data.collate import DataCollatorForInterleavedVideoSeq2Seq
    from eilev_tpu.data.frame import FrameInterleavedPresampledDataset
    from eilev_tpu.data.prompts import generate_input_ids_and_labels_from_interleaved
    from eilev_tpu.data.text import clean_narration_text, generate_chunks
    from eilev_tpu.generation import generate, generation_config_from_json
    from eilev_tpu.models.auto import load_model, load_tokenizer
    from eilev_tpu.ops.preprocess import process_videos
    from eilev_tpu.utils import WandbLogger

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
        # The fused Pallas kernels are single-device programs: under GSPMD they
        # would force full-activation gathers. The XLA path shards cleanly.
        set_default_attention_impl("xla")

    decoder_only = config.use_decoder_only_language_model

    vision_cache = None
    if args.vision_cache:
        if args.shuffle_in_context_example_frames:
            # the derangement ablation permutes videos relative to their
            # frame_paths, so path-keyed caching would reuse wrong features
            raise ValueError(
                "--vision_cache cannot be combined with "
                "--shuffle_in_context_example_frames"
            )
        from eilev_tpu.serving import VideoFeatureCache

        _img = config.vision_config.image_size
        vision_cache = VideoFeatureCache(
            model, variables, capacity=args.vision_cache,
            bucket=max(args.vision_chunks, 1) * 8,
            preprocess=lambda px: process_videos(
                px, height=_img, width=_img, dtype=dtype
            ),
        )

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
            "in_context_frame_paths": [i["frame_path"] for i in items[:-1]],
            "frame_path": query["frame_path"],
            "video_uid": query["video_uid"],
            "clip_index": query["clip_index"],
            **inputs,
        }
        if "video" in items[0]:
            out["pixel_values"] = np.stack([i["video"] for i in items])
        return out

    # with the feature cache, frames are fetched LAZILY for cache misses only
    # (the dataset returns metadata; the cache's loader PNG-decodes just the
    # missed videos) — host decode is the input bottleneck (docs/PERF.md)
    dataset = FrameInterleavedPresampledDataset(
        args.eval_frames_dir,
        args.in_context_query_map_file,
        args.in_context_example_frames_dir,
        annotation_file=args.eval_annotation_file,
        in_context_example_annotation_file=args.in_context_example_annotation_file,
        transform=preprocess,
        return_frames=vision_cache is None,
        shuffle_in_context_example_frames=args.shuffle_in_context_example_frames,
        rng=random.Random(args.random_seed),
    )
    frame_loader = None
    if vision_cache is not None:
        from eilev_tpu.data.frame import FrameDataset

        _ctx_raw = FrameDataset(
            args.in_context_example_frames_dir,
            annotation_file=args.in_context_example_annotation_file,
        )
        _eval_raw = FrameDataset(
            args.eval_frames_dir, annotation_file=args.eval_annotation_file
        )

        def frame_loader(key):
            ds = _ctx_raw if key in _ctx_raw.dict_data else _eval_raw
            return ds[key]["video"]
    # batch generation needs left padding (reference :230)
    collator = DataCollatorForInterleavedVideoSeq2Seq(
        pad_token_id=tokenizer.pad_token_id, padding_side="left"
    )

    # Accept the reference CLI's HF GenerationConfig JSON contract (reference
    # scripts/general/generate_narration_texts.py:203 forwards it verbatim to
    # HF generate); unsupported keys fail with the supported-key list.
    gen_cfg = generation_config_from_json(
        json.loads(args.generation_config),
        pad_token_id=tokenizer.pad_token_id,
        default_max_new_tokens=512,
    )

    logger = WandbLogger(project=args.wandb_project, enabled=args.wandb_project is not None)
    rows = []
    n = len(dataset) if args.num_eval_datapoints is None else min(args.num_eval_datapoints, len(dataset))

    def submit(chunk):
        feats = [dataset[i] for i in chunk]
        meta = [
            {
                k: f[k]
                for k in ("frame_path", "video_uid", "clip_index", "narration_text", "in_context_frame_paths")
            }
            for f in feats
        ]
        for f in feats:
            for k in ("narration_text", "in_context_frame_paths", "frame_path", "video_uid", "clip_index"):
                f.pop(k)
        batch = collator(feats)
        pixel = None
        video_features = None
        if vision_cache is not None:
            # key order matches the collator's video cat: per row, the
            # in-context examples then the query
            keys = [
                p
                for m in meta
                for p in (*m["in_context_frame_paths"], m["frame_path"])
            ]
            video_features = vision_cache.features(keys, loader=frame_loader)
        else:
            img = config.vision_config.image_size
            pixel = process_videos(
                jnp.asarray(batch["pixel_values"]), height=img, width=img, dtype=dtype
            )
        tokens = generate(
            model,
            variables,
            input_ids=jnp.asarray(batch["input_ids"]),
            attention_mask=jnp.asarray(batch["attention_mask"]),
            pixel_values=pixel,
            video_input_mask=jnp.asarray(batch["video_input_mask"]),
            generation_config=gen_cfg,
            vision_chunks=args.vision_chunks,
            draft_layers=args.draft_layers or None,
            draft_tokens=args.draft_tokens
            or (8 if args.draft == "prompt_lookup" else 4),
            draft=args.draft,
            draft_match_len=args.draft_match_len,
            video_features=video_features,
        )
        return meta, tokens

    def drain(meta, tokens):
        texts = tokenizer.batch_decode(np.asarray(tokens), skip_special_tokens=True)
        if len(texts) != len(meta):
            # num_return_sequences > 1: generate returns nrs rows per input,
            # interleaved (HF layout) — give each returned sequence its own
            # output row (the reference script would silently mispair here)
            nrs = len(texts) // len(meta)
            meta = [m for m in meta for _ in range(nrs)]
        for m, text in zip(meta, texts):
            row = {
                "frame_path": m["frame_path"],
                "video_uid": m["video_uid"],
                "clip_index": m["clip_index"],
                "generated": text.strip(),
                "ground_truth": m["narration_text"],
                "in_context_frame_paths": "|".join(m["in_context_frame_paths"]),
            }
            rows.append(row)
            if args.print_narration_texts:
                print(f"Generated: {row['generated']}  |  GT: {row['ground_truth']}")

    # Greedy/sampling generation is fully async on device: keep 2 batches in
    # flight so host-side decode/preprocess of batch i+1 overlaps device compute
    # of batch i (measured +57% throughput). Beam search is host-driven, so it
    # runs serially.
    pending: list = []
    max_in_flight = 1 if gen_cfg.num_beams > 1 else 2
    for chunk in generate_chunks(list(range(n)), args.batch_size):
        pending.append(submit(chunk))
        if len(pending) >= max_in_flight:
            drain(*pending.pop(0))
    while pending:
        drain(*pending.pop(0))

    with open(args.output_csv, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0]))
        writer.writeheader()
        writer.writerows(rows)
    logger.log_table(
        "generated_narration_texts",
        list(rows[0]),
        [[r[c] for c in rows[0]] for r in rows],
    )
    print(f"wrote {len(rows)} rows to {args.output_csv}")


if __name__ == "__main__":
    main()
