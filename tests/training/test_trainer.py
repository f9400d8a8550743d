"""Trainer end-to-end smoke: loss decreases, checkpoints written, resume works."""

import jax
import jax.numpy as jnp
import numpy as np

from eilev_tpu import configs
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.training import OptimizerConfig
from eilev_tpu.parallel import make_mesh
from eilev_tpu.training.checkpoint import latest_checkpoint
from eilev_tpu.training.trainer import Trainer, TrainerConfig


import pytest

pytestmark = pytest.mark.slow  # heavy equivalence/integration chain


def _make_batches(cfg, accum, micro_b, steps, seed):
    def gen(s):
        rng = np.random.default_rng(seed)
        img = cfg.vision_config.image_size
        q = cfg.num_query_tokens
        b = accum * micro_b
        for _ in range(steps):
            pixel = rng.normal(size=(b, 3, 2, img, img)).astype(np.float32)
            ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, 12))
            vim = np.zeros((b, 12), np.int64)
            vim[:, 1 : 1 + q] = 1
            labels = np.where(vim.astype(bool), -100, ids)
            yield {
                "input_ids": ids.reshape(accum, micro_b, 12),
                "attention_mask": np.ones((accum, micro_b, 12), np.int64),
                "labels": labels.reshape(accum, micro_b, 12),
                "video_input_mask": vim.reshape(accum, micro_b, 12),
                "pixel_values": pixel.reshape(accum, micro_b, 3, 2, img, img),
            }

    return gen


def test_trainer_end_to_end(tmp_path):
    cfg = configs.tiny_config(text_model="opt")
    model = VideoBlipForConditionalGeneration(cfg)
    rng = jax.random.PRNGKey(0)
    img = cfg.vision_config.image_size
    params = model.init(
        rng,
        input_ids=jnp.ones((1, 12), jnp.int32),
        pixel_values=jax.random.normal(rng, (1, 3, 2, img, img)),
        video_input_mask=jnp.zeros((1, 12), jnp.int32).at[:, 1 : 1 + cfg.num_query_tokens].set(1),
    )["params"]

    logs = []
    tconf = TrainerConfig(
        output_dir=str(tmp_path / "ckpt"),
        num_train_steps=10,
        gradient_accumulation_steps=2,
        per_device_batch_size=1,
        optimizer=OptimizerConfig(learning_rate=5e-3, warmup_steps=0, total_steps=10),
        eval_steps=3,
        save_steps=3,
        log_steps=1,
        dropout=False,
    )
    trainer = Trainer(
        model,
        params,
        tconf,
        train_batches=_make_batches(cfg, 2, 1, steps=100, seed=0),
        eval_batches=lambda: iter(
            [
                {
                    k: v[0]
                    for k, v in next(iter(_make_batches(cfg, 1, 2, 1, 1)(0))).items()
                }
            ]
        ),
        mesh=make_mesh(data=1),  # micro batch of 1: a >1 data axis would be an error
        logger=lambda step, m: logs.append((step, m)),
    )
    state = trainer.train()
    assert int(state.step) == 10
    losses = [m["loss"] for _, m in logs if "loss" in m]
    assert min(losses[-3:]) < losses[0]  # overfits the repeated batch
    assert latest_checkpoint(str(tmp_path / "ckpt")) is not None

    # resume: a fresh trainer picks up at the last checkpoint
    trainer2 = Trainer(
        model,
        params,
        TrainerConfig(
            output_dir=str(tmp_path / "ckpt"),
            num_train_steps=12,
            gradient_accumulation_steps=2,
            optimizer=OptimizerConfig(learning_rate=5e-3, warmup_steps=0, total_steps=14),
            eval_steps=0,
            save_steps=0,
            log_steps=100,
            dropout=False,
            resume_from_checkpoint=True,
        ),
        train_batches=_make_batches(cfg, 2, 1, steps=100, seed=0),
        mesh=make_mesh(data=1),
    )
    assert int(trainer2.state.step) == 10
    state2 = trainer2.train()
    assert int(state2.step) == 12


def test_trainer_async_save_resume(tmp_path):
    """cfg.async_save: overlapped checkpoints commit by the end of train() and
    a fresh Trainer resumes from them identically."""
    cfg = configs.tiny_config(text_model="opt")
    model = VideoBlipForConditionalGeneration(cfg)
    rng = jax.random.PRNGKey(0)
    img = cfg.vision_config.image_size
    params = model.init(
        rng,
        input_ids=jnp.ones((1, 12), jnp.int32),
        pixel_values=jax.random.normal(rng, (1, 3, 2, img, img)),
        video_input_mask=jnp.zeros((1, 12), jnp.int32).at[:, 1 : 1 + cfg.num_query_tokens].set(1),
    )["params"]
    tconf = TrainerConfig(
        output_dir=str(tmp_path / "ckpt"),
        num_train_steps=4,
        gradient_accumulation_steps=2,
        per_device_batch_size=1,
        optimizer=OptimizerConfig(learning_rate=5e-3, warmup_steps=0, total_steps=10),
        eval_steps=0,
        save_steps=2,
        log_steps=10,
        dropout=False,
        load_best_model_at_end=False,
        async_save=True,
    )
    trainer = Trainer(
        model, params, tconf,
        train_batches=_make_batches(cfg, 2, 1, steps=100, seed=0),
        mesh=make_mesh(data=1),
    )
    state = trainer.train()
    latest = latest_checkpoint(tconf.output_dir)
    assert latest is not None and latest.endswith("/4")

    # resume: a fresh trainer picks up at step 4 with identical trainables
    tconf2 = TrainerConfig(**{**tconf.__dict__, "resume_from_checkpoint": True,
                              "num_train_steps": 4})
    trainer2 = Trainer(
        model, params, tconf2,
        train_batches=_make_batches(cfg, 2, 1, steps=100, seed=0),
        mesh=make_mesh(data=1),
    )
    assert int(trainer2.state.step) == 4
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        trainer2.state.trainable,
        state.trainable,
    )


def test_profile_steps_writes_trace(tmp_path):
    """profile_steps=(lo, hi) captures a jax.profiler trace to output_dir/trace."""
    import os

    from eilev_tpu import configs
    from eilev_tpu.models import VideoBlipForConditionalGeneration
    from eilev_tpu.training import OptimizerConfig
    from eilev_tpu.training.trainer import Trainer, TrainerConfig

    cfg = configs.tiny_config()
    model = VideoBlipForConditionalGeneration(cfg)
    from .test_train_step import _tiny_batch

    batch = _tiny_batch(cfg, accum=1, micro_b=2)
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(batch["input_ids"][0]),
        pixel_values=jnp.asarray(batch["pixel_values"][0]),
        video_input_mask=jnp.asarray(batch["video_input_mask"][0]),
    )["params"]

    def train_batches(seed):
        for _ in range(3):
            yield batch

    t = Trainer(
        model, params,
        TrainerConfig(
            output_dir=str(tmp_path), num_train_steps=3,
            gradient_accumulation_steps=1,
            optimizer=OptimizerConfig(warmup_steps=0, total_steps=3),
            eval_steps=0, save_steps=0, log_steps=100, dropout=False,
            load_best_model_at_end=False, profile_steps=(1, 2),
        ),
        train_batches,
        mesh=__import__("eilev_tpu.parallel", fromlist=["make_mesh"]).make_mesh(
            data=2, devices=jax.devices()[:2]
        ),
    )
    t.train()
    trace_dir = tmp_path / "trace"
    assert trace_dir.exists() and any(trace_dir.rglob("*")), "no trace captured"
