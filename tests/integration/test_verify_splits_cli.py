"""verify_narrated_action_splits CLI: detect + repair misplaced frame dirs."""

import csv
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest

pytestmark = pytest.mark.slow  # CLI integration chain


def _write_frames(root, rows):
    root.mkdir(parents=True, exist_ok=True)
    for r in rows:
        (root / r["frame_path"]).mkdir()
    with open(root / "narrated_actions.csv", "w", newline="") as f:
        w = csv.DictWriter(
            f,
            ["frame_path", "video_uid", "clip_index", "narration_timestamp_sec",
             "narration_text", "structured_verb", "structured_noun"],
        )
        w.writeheader()
        w.writerows(rows)


def _row(uid, idx):
    return dict(frame_path=f"{uid}|{idx}", video_uid=uid, clip_index=str(idx),
                narration_timestamp_sec="1.0", narration_text="#C C x",
                structured_verb="take", structured_noun="knife")


def _run(args):
    proc = subprocess.run(
        [sys.executable] + args, capture_output=True, text=True, cwd=REPO,
        env=dict(os.environ, JAX_PLATFORMS="cpu"), timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_verify_and_repair(tmp_path):
    splits = tmp_path / "splits"
    splits.mkdir()
    (splits / "fho_main_train.json").write_text(json.dumps({"split": "train", "videos": {"vidA": 1, "vidB": 1}}))
    (splits / "fho_main_val.json").write_text(json.dumps({"split": "val", "videos": {"vidC": 1}}))

    train_dir = tmp_path / "train"
    val_dir = tmp_path / "val"
    # vidC's clip wrongly sits in train; vidB's wrongly in val
    _write_frames(train_dir, [_row("vidA", 0), _row("vidC", 0)])
    _write_frames(val_dir, [_row("vidB", 0)])

    out = _run([
        "scripts/ego4d/verify_narrated_action_splits.py",
        str(splits), str(train_dir), str(val_dir),
    ])
    assert "2 misplaced" in out
    assert "would move" in out  # dry run default

    _run([
        "scripts/ego4d/verify_narrated_action_splits.py",
        str(splits), str(train_dir), str(val_dir), "--no-dry-run",
    ])
    # dirs moved
    assert (val_dir / "vidC|0").exists() and not (train_dir / "vidC|0").exists()
    assert (train_dir / "vidB|0").exists() and not (val_dir / "vidB|0").exists()
    # CSVs rewritten
    train_rows = {r["frame_path"] for r in csv.DictReader(open(train_dir / "narrated_actions.csv"))}
    val_rows = {r["frame_path"] for r in csv.DictReader(open(val_dir / "narrated_actions.csv"))}
    assert train_rows == {"vidA|0", "vidB|0"}
    assert val_rows == {"vidC|0"}

    # idempotent: second pass finds nothing
    out = _run([
        "scripts/ego4d/verify_narrated_action_splits.py",
        str(splits), str(train_dir), str(val_dir),
    ])
    assert "0 misplaced" in out
