"""train_v2 CLI end to end: tiny checkpoint + synthetic frames -> steps run,
checkpoint written, HF export loadable."""

import csv
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


pytestmark = pytest.mark.slow  # heavy equivalence/integration chain


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    import imageio.v3 as iio

    from tests.models.hf_util import make_oracle
    from tests.util_tokenizer import build_tiny_tokenizer

    root = tmp_path_factory.mktemp("train_world")
    frames = root / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    actions = [("take", "knife"), ("cut", "onion"), ("wash", "plate"), ("take", "onion")]
    for i, (v, n) in enumerate(actions):
        fp = f"vid{i}|0"
        d = frames / fp
        d.mkdir()
        for t in range(4):
            iio.imwrite(d / f"{fp}|{t}.png", rng.integers(0, 255, (32, 32, 3)).astype(np.uint8), extension=".png")
        rows.append(dict(frame_path=fp, video_uid=f"vid{i}", clip_index="0",
                         narration_timestamp_sec="4.0", narration_text=f"#C C does {v} {n}",
                         structured_verb=v, structured_noun=n))
    with open(frames / "narrated_actions.csv", "w", newline="") as f:
        w = csv.DictWriter(f, list(rows[0]))
        w.writeheader()
        w.writerows(rows)

    model, cfg, _ = make_oracle("opt", image_size=32, patch_size=16, vocab_size=384)
    ckpt = root / "checkpoint"
    model.save_pretrained(str(ckpt), safe_serialization=True)
    build_tiny_tokenizer(str(ckpt), vocab_size=384)
    return root


def test_train_v2_cli(world):
    out_dir = str(world / "train_out")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [
            sys.executable, "scripts/train_v2.py",
            "--model_name_or_path", str(world / "checkpoint"),
            "--dtype", "fp32",
            "--train_frames_dir", str(world / "frames"),
            "--val_frames_dir", str(world / "frames"),
            "--train_num_in_context_examples_per_sample", "1",
            "--val_num_in_context_examples_per_sample", "1",
            "--verb_noun_ratio", "0.5",
            "--num_subsample_frames", "2",
            "--max_length", "128",
            "--output_dir", out_dir,
            "--num_train_steps", "2",
            "--per_device_train_batch_size", "1",
            "--gradient_accumulation_steps", "2",
            "--learning_rate", "1e-3",
            "--warmup_steps", "0",
            "--eval_steps", "2",
            "--save_steps", "2",
            "--logging_steps", "1",
            "--data_parallel", "1",
            "--export_hf",
        ],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900,
    )
    assert proc.returncode == 0, f"STDOUT:\n{proc.stdout[-2500:]}\nSTDERR:\n{proc.stderr[-2500:]}"
    # loss was logged
    assert "loss" in proc.stdout
    # orbax checkpoint written
    steps = [d for d in os.listdir(out_dir) if d.isdigit()]
    assert steps, os.listdir(out_dir)
    # HF export round-trips through our loader
    assert os.path.exists(os.path.join(out_dir, "hf", "model.safetensors"))
    import shutil

    shutil.copy(str(world / "checkpoint" / "config.json"), os.path.join(out_dir, "hf", "config.json"))
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from eilev_tpu.models.auto import load_model

    model, variables, config = load_model(os.path.join(out_dir, "hf"))
    assert config.num_query_tokens == 4
