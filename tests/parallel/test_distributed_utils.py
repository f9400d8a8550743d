"""Single-process behavior of the multi-host utilities + launcher generators."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu.parallel import make_mesh
from eilev_tpu.parallel.distributed import gather_to_host, host_local_batch_to_global

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_host_local_batch_to_global_single_process():
    mesh = make_mesh(data=8, model=1)
    batch = {
        "input_ids": np.arange(2 * 8 * 4).reshape(2, 8, 4),
        "pixel_values": np.ones((2, 8, 3, 2, 4, 4), np.float32),
    }
    global_batch = host_local_batch_to_global(batch, mesh)
    # single process: global shape == local shape, sharded over 'data' on axis 1
    assert global_batch["input_ids"].shape == (2, 8, 4)
    assert global_batch["pixel_values"].shape == (2, 8, 3, 2, 4, 4)
    np.testing.assert_array_equal(np.asarray(global_batch["input_ids"]), batch["input_ids"])
    sh = global_batch["input_ids"].sharding
    assert sh.num_devices == 8


def test_gather_to_host():
    mesh = make_mesh(data=8, model=1)
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jax.device_put(jnp.arange(16.0).reshape(8, 2), NamedSharding(mesh, P("data")))
    out = gather_to_host(x)
    np.testing.assert_array_equal(out, np.arange(16.0).reshape(8, 2))


@pytest.mark.slow
def test_launcher_dry_runs(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    def run(args):
        proc = subprocess.run(
            [sys.executable] + args, capture_output=True, text=True, cwd=str(tmp_path),
            env=env, timeout=120,
        )
        assert proc.returncode == 0, proc.stderr[-1500:]
        return proc.stdout

    out = run([
        os.path.join(REPO, "launch/submit_train_v2.py"),
        "--backend", "slurm", "--account", "acc", "--partition", "part",
        "--num_chips", "8", "--train_batch_size", "128", "--dry_run",
        "--", "--model_name_or_path", "/m", "--train_frames_dir", "/t",
        "--val_frames_dir", "/v", "--output_dir", "/o",
    ])
    # the reference recipe: global batch 128 over 8 chips -> grad accum 16
    assert "--gradient_accumulation_steps 16" in out
    assert "--data_parallel 8" in out
    assert "#SBATCH --partition=part" in out
    assert (tmp_path / "eilev-train-v2.sh").exists()

    out = run([
        os.path.join(REPO, "launch/submit_icl_eval.py"),
        "--tpu_name", "my-tpu", "--zone", "us-z", "--dry_run",
        "--", "--model", "/m", "--num_shot", "16",
    ])
    assert "gcloud compute tpus tpu-vm ssh my-tpu" in out
    assert "scripts/icl_eval.py" in out

    # baseline launchers (reference slurm-scripts/train/submit_videomae_train.py
    # + icl-eval/submit_{videomae,majority}_generate_full_sent.py)
    out = run([
        os.path.join(REPO, "launch/submit_videomae_train.py"),
        "--backend", "slurm", "--account", "acc", "--partition", "part",
        "--verb", "--train_batch_size", "64", "--wandb_project", "wp", "--dry_run",
        "--", "--train_frames_dir", "/t", "--val_frames_dir", "/v", "--output_dir", "/o",
    ])
    assert "scripts/baselines/videomae_train.py" in out
    assert "--verb" in out and "--batch_size 64" in out
    assert "export WANDB_PROJECT=wp" in out
    assert "--wandb_project" not in out.split("videomae_train.py")[1]
    assert (tmp_path / "videomae-train-verb.sh").exists()

    for mode in ("videomae", "majority"):
        out = run([
            os.path.join(REPO, "launch/submit_generate_full_sent.py"),
            "--mode", mode, "--tpu_name", "t", "--zone", "z", "--dry_run",
            "--", "--model", "/llama", "--predictions_csv", "/p.csv",
            "--output_csv", "/o.csv",
        ])
        assert f"scripts/baselines/{mode}_generate_full_sent.py" in out
        assert (tmp_path / f"{mode}-generate-full-sent.sh").exists()
