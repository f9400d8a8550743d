#!/usr/bin/env python
"""Backfill structured_verb / structured_noun columns into narrated_actions.csv
from fho_main.json.

CLI-parity target: /root/reference/scripts/ego4d/add_structured_verb_noun.py -
frame_path keys are '{video_uid}|{running clip index over filtered actions}'.
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import csv
import json


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("fho_main")
    p.add_argument("narrated_actions_csv")
    p.add_argument("outfile")
    args = p.parse_args()

    from eilev_tpu.data.video_datasets import filter_action, get_structured_noun

    with open(args.fho_main) as f:
        fho_main = json.load(f)

    verb_map: dict[str, str] = {}
    noun_map: dict[str, str | None] = {}
    for video in fho_main["videos"]:
        clip_id = 0
        for interval in video["annotated_intervals"]:
            for action in interval["narrated_actions"]:
                if not filter_action(action):
                    continue
                frame_path = f"{video['video_uid']}|{clip_id}"
                clip_id += 1
                verb_map[frame_path] = action["structured_verb"]
                noun_map[frame_path] = get_structured_noun(action)

    fields = [
        "frame_path",
        "video_uid",
        "clip_index",
        "narration_timestamp_sec",
        "narration_text",
        "structured_verb",
        "structured_noun",
    ]
    with open(args.narrated_actions_csv, newline="") as inf, open(
        args.outfile, "w", newline=""
    ) as outf:
        writer = csv.DictWriter(outf, fields)
        writer.writeheader()
        for row in csv.DictReader(inf):
            writer.writerow(
                {
                    "structured_verb": verb_map[row["frame_path"]],
                    "structured_noun": noun_map[row["frame_path"]],
                    **row,
                }
            )


if __name__ == "__main__":
    main()
