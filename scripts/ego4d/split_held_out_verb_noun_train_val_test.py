#!/usr/bin/env python
"""Common/rare verb-noun-pair split: common pairs -> train/val, rare -> test.

CLI-parity target: /root/reference/scripts/ego4d/split_held_out_verb_noun_train_val_test.py -
count (verb, noun) pairs across narrated-action CSVs, cut at --num_common_action
or --common_percent of the cumulative count, shuffle the common set and split
train/val at --train_val_split; write train/val/test.csv.
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import csv
import random
from collections import Counter
from pathlib import Path

import numpy as np


def split_common_rare(counter, num_common_action, common_percent):
    items, counts = zip(*counter.most_common())
    if num_common_action is not None:
        cut_off = num_common_action
    else:
        cumulative = np.cumsum(counts)
        cut_off = int(np.where(cumulative >= common_percent * cumulative[-1])[0][0]) + 1
    return list(items[:cut_off]), list(items[cut_off:])


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("narrated_action_files", nargs="+")
    p.add_argument("split_output_path")
    p.add_argument("train_val_split", type=float)
    p.add_argument("--num_common_action", type=int)
    p.add_argument("--common_percent", type=float)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()
    if args.num_common_action is not None and args.common_percent is not None:
        raise SystemExit("Only one of --num_common_action and --common_percent can be set.")

    rng = random.Random(args.seed)
    narrated_actions: list[dict] = []
    for f in args.narrated_action_files:
        with open(f, newline="") as fh:
            narrated_actions.extend(csv.DictReader(fh))
    print(f"Total # of narrated actions: {len(narrated_actions)}")

    counter = Counter(
        (a["structured_verb"], a["structured_noun"])
        for a in narrated_actions
        if a["structured_verb"] and a["structured_noun"]
    )
    common, rare = split_common_rare(counter, args.num_common_action, args.common_percent)
    print(f"common pairs: {len(common)}, rare pairs: {len(rare)}")

    common_set, rare_set = set(common), set(rare)
    train_val, test = [], []
    for a in narrated_actions:
        pair = (a["structured_verb"], a["structured_noun"])
        if pair in common_set:
            train_val.append(a)
        elif pair in rare_set:
            test.append(a)
    rng.shuffle(train_val)
    split_index = round(len(train_val) * args.train_val_split)
    train, val = train_val[:split_index], train_val[split_index:]
    print(f"train={len(train)} val={len(val)} test={len(test)} "
          f"unused={len(narrated_actions) - len(train) - len(val) - len(test)}")

    out = Path(args.split_output_path)
    out.mkdir(parents=True, exist_ok=True)
    columns = list(train[0].keys())
    for name, rows in [("train", train), ("val", val), ("test", test)]:
        with open(out / f"{name}.csv", "w", newline="") as fh:
            w = csv.DictWriter(fh, columns)
            w.writeheader()
            w.writerows(rows)


if __name__ == "__main__":
    main()
