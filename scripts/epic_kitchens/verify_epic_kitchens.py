#!/usr/bin/env python
"""Consistency check: extracted EK narrated_actions.csv vs the original
full-sentence annotation (counts and text alignment per video).

CLI-parity target: /root/reference/scripts/epic-kitchens/verify_epic_kitchens.py.
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import csv
from collections import defaultdict


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("original_full_sent_annotation")
    p.add_argument("extracted_narrated_actions_annotation")
    args = p.parse_args()

    original: dict[str, list[dict]] = defaultdict(list)
    with open(args.original_full_sent_annotation, newline="") as f:
        for row in csv.DictReader(f):
            original[row["video_id"]].append(row)

    extracted: dict[str, list[dict]] = defaultdict(list)
    with open(args.extracted_narrated_actions_annotation, newline="") as f:
        for row in csv.DictReader(f):
            extracted[row["video_uid"]].append(row)

    mismatches = 0
    for video_uid in original:
        if len(original[video_uid]) != len(extracted[video_uid]):
            mismatches += 1
            print(f"{video_uid}: original {len(original[video_uid])} vs "
                  f"extracted {len(extracted[video_uid])}")
            for i, ext in enumerate(extracted[video_uid]):
                if (
                    i < len(original[video_uid])
                    and ext["narration_text"] != original[video_uid][i]["full_sent_narration"]
                ):
                    print(f"  difference at index {i}")
    print("OK" if mismatches == 0 else f"{mismatches} videos mismatched")


if __name__ == "__main__":
    main()
