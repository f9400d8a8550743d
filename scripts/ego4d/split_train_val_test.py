#!/usr/bin/env python
"""Video-level 75/25 x 75/25 train/val/test split of Ego4D fho_main by
narrated-action counts.

CLI-parity target: /root/reference/scripts/ego4d/split_train_val_test.py -
filters to videos that exist on disk and have usable narrated actions, then
randomly assigns whole videos until the per-split narrated-action targets are
hit (seed 42); writes fho_main_{train,val,test}.json with
{"split": ..., "videos": {video_uid: num_narrated_actions}}.
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
import json
import random
from pathlib import Path


def split_videos(video_dict, video_uids, goal_first, rng):
    first, second = {}, {}
    count_first = 0
    for uid in rng.sample(list(video_uids), k=len(video_uids)):
        n = len(video_dict[uid]["narrated_actions"])
        if count_first < goal_first:
            first[uid] = n
            count_first += n
        else:
            second[uid] = n
    return first, second


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("fho_main_path")
    p.add_argument("split_output_path")
    p.add_argument("video_dir_path")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from eilev_tpu.data.video_datasets import filter_action

    with open(args.fho_main_path) as f:
        data = json.load(f)

    video_dir = Path(args.video_dir_path)
    video_dict = {
        v["video_uid"]: v
        for v in data["videos"]
        if (video_dir / (v["video_uid"] + ".mp4")).exists()
    }
    print(f"num videos before filtering: {len(video_dict)}")
    for video in video_dict.values():
        video["narrated_actions"] = [
            a
            for interval in video["annotated_intervals"]
            for a in interval["narrated_actions"]
            if filter_action(a)
        ]
    video_dict = {k: v for k, v in video_dict.items() if v["narrated_actions"]}
    print(f"num videos after filtering: {len(video_dict)}")

    total = sum(len(v["narrated_actions"]) for v in video_dict.values())
    goal_train_val = round(total * 0.75)
    goal_train = round(goal_train_val * 0.75)
    print(f"total narrated actions: {total}; goals train={goal_train} "
          f"val={goal_train_val - goal_train} test={total - goal_train_val}")

    rng = random.Random(args.seed)
    train_val, test = split_videos(video_dict, video_dict.keys(), goal_train_val, rng)
    train, val = split_videos(video_dict, train_val.keys(), goal_train, rng)

    assert total == sum(train.values()) + sum(val.values()) + sum(test.values())
    out = Path(args.split_output_path)
    out.mkdir(parents=True, exist_ok=True)
    for name, videos in [("train", train), ("val", val), ("test", test)]:
        with open(out / f"fho_main_{name}.json", "w") as f:
            json.dump({"split": name, "videos": videos}, f)
        print(f"{name}: {len(videos)} videos, {sum(videos.values())} narrated actions")


if __name__ == "__main__":
    main()
