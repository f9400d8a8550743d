#!/usr/bin/env python
"""Offline preprocessing: decode Ego4D fho clips -> subsampled, resized PNG
frames + narrated_actions.csv.

CLI-parity target: /root/reference/scripts/ego4d/extract_frames.py - 8 s clips
around each narration, N uniform frames, bicubic resize to 2x the model image
size (headroom for RandomResizedCrop, reference :71-76), PNGs named
``{video_uid}|{clip_index}/{video_uid}|{clip_index}|{i}.png`` plus the CSV schema
(frame_path, video_uid, clip_index, narration_timestamp_sec, narration_text,
structured_verb, structured_noun).

Decode runs through the framework's native libav stage with a thread pool
(replacing DataLoader worker processes); resize runs fused on device via
ops.preprocess.
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


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fho_main_path", required=True)
    p.add_argument("--split_path", required=True)
    p.add_argument("--video_dir_path", required=True)
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--num_subsample_frames", type=int, required=True)
    p.add_argument("--target_size", type=int, default=448, help="2x model image size")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--max_num_narrated_actions", type=int, default=0)
    p.add_argument("--csv_only", action="store_true")
    p.add_argument(
        "--format",
        choices=("png", "raw"),
        default="png",
        help="png: per-frame PNGs (the reference's format). raw: one "
        "memmap-able uint8 .npy per clip - zero decode work at load time "
        "(PNG decode is the measured host input bottleneck, docs/PERF.md); "
        "~3.5x larger on disk. Same directory + CSV contract either way.",
    )
    return p.parse_args()


def main() -> None:
    args = parse_args()
    import jax.numpy as jnp

    from eilev_tpu.data.frame import save_frame_video
    from eilev_tpu.data.video_datasets import Ego4dFHOMainDataset
    from eilev_tpu.ops.preprocess import resize_video

    os.makedirs(args.frames_dir, exist_ok=True)

    dataset = Ego4dFHOMainDataset(
        args.fho_main_path,
        args.split_path,
        args.video_dir_path,
        num_frames=args.num_subsample_frames,
    )

    pool = ThreadPoolExecutor(args.num_workers)

    def write_frames(video_u8: np.ndarray, frame_path: str) -> None:
        save_frame_video(args.frames_dir, frame_path, video_u8, fmt=args.format, pool=pool)

    csv_path = os.path.join(args.frames_dir, "narrated_actions.csv")
    fields = [
        "frame_path",
        "video_uid",
        "clip_index",
        "narration_timestamp_sec",
        "narration_text",
        "structured_verb",
        "structured_noun",
    ]
    count = 0
    with open(csv_path, "w", newline="") as csvfile:
        writer = csv.DictWriter(csvfile, fields)
        writer.writeheader()
        for item in dataset:
            frame_path = f"{item['video_uid']}|{item['clip_index']}"
            if not args.csv_only:
                resized = resize_video(
                    jnp.asarray(item["video"]), args.target_size, args.target_size
                )
                u8 = np.asarray(jnp.clip(jnp.round(resized), 0, 255)).astype(np.uint8)
                write_frames(u8, frame_path)
            writer.writerow(
                {
                    "frame_path": frame_path,
                    "video_uid": item["video_uid"],
                    "clip_index": item["clip_index"],
                    "narration_timestamp_sec": item["narration_timestamp_sec"],
                    "narration_text": str(item["narration_text"]).strip(),
                    "structured_verb": item["structured_verb"],
                    "structured_noun": item["structured_noun"],
                }
            )
            count += 1
            if count % 50 == 0:
                print(f"extracted {count} narrated actions", flush=True)
            if args.max_num_narrated_actions and count >= args.max_num_narrated_actions:
                break
    pool.shutdown()
    print(f"done: {count} narrated actions -> {args.frames_dir}")


if __name__ == "__main__":
    main()
