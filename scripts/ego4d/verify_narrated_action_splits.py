#!/usr/bin/env python
"""Repair/verify tool: move extracted frame dirs between train/val splits so they
match the split JSONs.

CLI-parity target: /root/reference/scripts/ego4d/verify_narrated_action_splits.py
(written because early splits included videos missing on disk). Checks each
extracted frame_path against the split membership and (without --verify-only and
with --no-dry-run) moves directories + CSV rows to the correct split.
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import json
import shutil
from csv import DictReader, DictWriter
from pathlib import Path

FIELDS = [
    "frame_path",
    "video_uid",
    "clip_index",
    "narration_timestamp_sec",
    "narration_text",
    "structured_verb",
    "structured_noun",
]


def load_csv(frames_path: Path) -> dict[str, dict]:
    with open(frames_path / "narrated_actions.csv", newline="") as f:
        return {row["frame_path"]: row for row in DictReader(f)}


def dump_csv(frames_path: Path, rows: dict[str, dict]) -> None:
    with open(frames_path / "narrated_actions.csv", "w", newline="") as f:
        fields = [c for c in FIELDS if any(c in r for r in rows.values())] or FIELDS
        w = DictWriter(f, fields, extrasaction="ignore")
        w.writeheader()
        for row in rows.values():
            w.writerow(row)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("split_output_path", help="dir with fho_main_{train,val}.json")
    p.add_argument("train_extracted_frames_path")
    p.add_argument("val_extracted_frames_path")
    p.add_argument("--dry-run", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--verify-only", action="store_true")
    args = p.parse_args()

    split_dir = Path(args.split_output_path)
    with open(split_dir / "fho_main_train.json") as f:
        train_videos = set(json.load(f)["videos"])
    with open(split_dir / "fho_main_val.json") as f:
        val_videos = set(json.load(f)["videos"])

    dirs = {
        "train": Path(args.train_extracted_frames_path),
        "val": Path(args.val_extracted_frames_path),
    }
    rows = {name: load_csv(d) for name, d in dirs.items()}
    membership = {"train": train_videos, "val": val_videos}

    misplaced: list[tuple[str, str, str]] = []  # (frame_path, from, to)
    for name, split_rows in rows.items():
        other = "val" if name == "train" else "train"
        for frame_path, row in split_rows.items():
            if row["video_uid"] not in membership[name]:
                if row["video_uid"] in membership[other]:
                    misplaced.append((frame_path, name, other))
                else:
                    print(f"ORPHAN: {frame_path} (video not in any split)")

    print(f"{len(misplaced)} misplaced frame dirs")
    if args.verify_only or args.dry_run:
        for fp, src, dst in misplaced:
            print(f"would move {fp}: {src} -> {dst}")
        return

    for fp, src, dst in misplaced:
        row = rows[src].pop(fp)
        rows[dst][fp] = row
        src_dir = dirs[src] / fp
        if src_dir.exists():
            shutil.move(str(src_dir), str(dirs[dst] / fp))
        print(f"moved {fp}: {src} -> {dst}")
    for name, d in dirs.items():
        dump_csv(d, rows[name])


if __name__ == "__main__":
    main()
