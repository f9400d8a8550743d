#!/usr/bin/env python
"""Extract EPIC-KITCHENS frames + narrated_actions.csv.

CLI-parity target: /root/reference/scripts/epic-kitchens/epic_kitchens_extract_frames.py -
same PNG/CSV contract as the Ego4D extractor; CSV rows carry the EK full-sentence
narration and verb/noun classes (frame_path, video_uid=video_id, clip_index,
narration_timestamp_sec, narration_text=full_sent_narration, structured_verb=verb,
structured_noun=noun).
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))
# honor JAX_PLATFORMS even under the axon TPU plugin (which overrides the env var)
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import argparse
import csv
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--annotation_path", required=True, help="full-sentence EK annotation CSV")
    p.add_argument("--epic_kitchens_55_video_dir_path", required=True)
    p.add_argument("--epic_kitchens_100_video_dir_path", required=True)
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--num_subsample_frames", type=int, required=True)
    p.add_argument("--target_size", type=int, default=448)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--max_num_narrated_actions", type=int, default=0)
    p.add_argument("--csv_only", action="store_true")
    p.add_argument(
        "--format", choices=("png", "raw"), default="png",
        help="png: per-frame PNGs (reference format); raw: one uint8 .npy per "
        "clip, zero decode at load time (see scripts/ego4d/extract_frames.py)",
    )
    args = p.parse_args()

    import jax.numpy as jnp

    from eilev_tpu.data.frame import save_frame_video
    from eilev_tpu.data.video_datasets import EpicKitchensDataset
    from eilev_tpu.ops.preprocess import resize_video

    os.makedirs(args.frames_dir, exist_ok=True)
    dataset = EpicKitchensDataset(
        args.annotation_path,
        args.epic_kitchens_55_video_dir_path,
        args.epic_kitchens_100_video_dir_path,
        num_frames=args.num_subsample_frames,
    )
    pool = ThreadPoolExecutor(args.num_workers)

    def write_frames(video_u8: np.ndarray, frame_path: str) -> None:
        save_frame_video(args.frames_dir, frame_path, video_u8, fmt=args.format, pool=pool)

    fields = [
        "frame_path", "video_uid", "clip_index", "narration_timestamp_sec",
        "narration_text", "structured_verb", "structured_noun",
    ]
    count = 0
    with open(os.path.join(args.frames_dir, "narrated_actions.csv"), "w", newline="") as csvfile:
        writer = csv.DictWriter(csvfile, fields)
        writer.writeheader()
        for item in dataset:
            frame_path = f"{item['video_id']}|{item['clip_index']}"
            if not args.csv_only:
                resized = resize_video(jnp.asarray(item["video"]), args.target_size, args.target_size)
                u8 = np.asarray(jnp.clip(jnp.round(resized), 0, 255)).astype(np.uint8)
                write_frames(u8, frame_path)
            writer.writerow(
                {
                    "frame_path": frame_path,
                    "video_uid": item["video_id"],
                    "clip_index": item["clip_index"],
                    "narration_timestamp_sec": item["narration_timestamp_sec"],
                    "narration_text": str(item.get("full_sent_narration", item.get("narration", ""))).strip(),
                    "structured_verb": item.get("verb", ""),
                    "structured_noun": item.get("noun", ""),
                }
            )
            count += 1
            if args.max_num_narrated_actions and count >= args.max_num_narrated_actions:
                break
    pool.shutdown()
    print(f"done: {count} narrated actions -> {args.frames_dir}")


if __name__ == "__main__":
    main()
