"""Host input-pipeline throughput: can frame loading feed the chip?

The serving profile decodes narrations at up to ~34 videos/s (docs/PERF.md),
i.e. ~2 datapoints/s of 17-clip 16-shot prompts = ~272 PNG frames/s of
448x448 decode + resize on the HOST. The reference hides this cost in
DataLoader worker processes; our equivalent is the thread-pool loader
(training/data_module.py num_workers — PNG decode and tokenization release
the GIL in their C cores). This benchmark measures the real
train_batch_iterator end to end (frame IO -> prompts -> collate -> device
preprocess) over synthetic flagship-size frames at several worker counts.

Usage: python benchmarks/input_pipeline.py [--clips 64] [--shots 16]
"""

from __future__ import annotations

import argparse
import csv
import os
import random
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAME_SIZE = 448  # extract_frames.py writes 2x image_size for crop headroom
FRAMES_PER_CLIP = 8


def make_frames_tree(root: Path, clips: int, fmt: str = "png") -> None:
    import numpy as np

    from eilev_tpu.data.frame import save_frame_video

    verbs = ["take", "cut", "wash", "stir", "open", "close"]
    nouns = ["knife", "spoon", "onion", "pot", "door", "jar"]
    rng = np.random.default_rng(0)
    rows = []
    for i in range(clips):
        fp = f"vid{i}|0"
        clip = rng.integers(
            0, 256, (3, FRAMES_PER_CLIP, FRAME_SIZE, FRAME_SIZE), np.uint8
        )
        save_frame_video(root, fp, clip, fmt=fmt)
        rows.append({
            "frame_path": fp, "video_uid": f"vid{i}", "clip_index": "0",
            "narration_timestamp_sec": "4.0",
            "narration_text": f"#C C does action {i}",
            "structured_verb": verbs[i % len(verbs)],
            "structured_noun": nouns[(i * 7) % len(nouns)],
        })
    with open(root / "narrated_actions.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=64)
    p.add_argument("--shots", type=int, default=16)
    p.add_argument("--datapoints", type=int, default=8)
    p.add_argument("--workers", type=int, nargs="+", default=[0, 2, 4, 8])
    p.add_argument(
        "--format", choices=("png", "raw"), nargs="+", default=["png", "raw"],
        help="on-disk frame cache format(s) to measure (raw = zero-decode "
        ".npy clips from extract_frames.py --format raw)",
    )
    args = p.parse_args()

    # the host stage is tokenizer-agnostic (frame IO dominates); the mock
    # tokenizer keeps this hermetic under zero egress
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

    print(f"host cores: {os.cpu_count()} (absolute numbers scale with cores; "
          "on a 1-vCPU dev host gains come only from IO-wait overlap)")
    videos_per = args.shots + 1
    for fmt in args.format:
        tmp = Path(tempfile.mkdtemp())
        print(f"[{fmt}] writing {args.clips} clips x {FRAMES_PER_CLIP} "
              f"{FRAME_SIZE}^2 frames ...")
        make_frames_tree(tmp, args.clips, fmt=fmt)
        run_format(args, tmp, fmt, videos_per)


def run_format(args, tmp: Path, fmt: str, videos_per: int) -> None:
    import random

    from eilev_tpu.data.frame import FrameInterleavedDataset
    from eilev_tpu.training.data_module import (
        InterleavedPreprocessor,
        _ordered_parallel,
    )
    from tests.data.mock_tokenizer import MockTokenizer

    for workers in args.workers:
        # time the HOST stage the workers parallelize: frame IO + prompt
        # assembly + tokenize (device preprocess/augment runs on-chip in
        # production and overlaps via the Trainer prefetcher)
        ds = FrameInterleavedDataset(
            str(tmp), num_in_context_examples_per_sample=args.shots,
            rng=random.Random(0),
        )
        pre = InterleavedPreprocessor(MockTokenizer(), 32, True, random.Random(0))
        order = [i % args.clips for i in range(args.datapoints + 1)]

        def tasks():
            for i in order:
                plan = ds.plan(i)
                yield plan, pre.draw_prompts(len(plan[0]) + 1)

        if workers:
            stream = _ordered_parallel(
                lambda t: pre.apply(ds.load_plan(t[0]), t[1]), tasks(), workers
            )
        else:
            stream = (pre.apply(ds.load_plan(t[0]), t[1]) for t in tasks())
        next(stream)  # warm the page cache
        t0 = time.perf_counter()
        n = 0
        for _ in stream:
            n += 1
        dt = time.perf_counter() - t0
        dps = n / dt
        print(
            f"[{fmt}] workers={workers}: {dps:6.2f} datapoints/s = "
            f"{dps * videos_per:7.1f} videos/s "
            f"({dps * videos_per * FRAMES_PER_CLIP:7.0f} frames/s)"
        )


if __name__ == "__main__":
    main()
