"""Product-path parallelism tests: the Trainer (the object behind
scripts/train_v2.py) must actually apply tensor-parallel param shardings when
the mesh has a model axis, shard the optimizer state ZeRO-style when asked,
fail loudly on an indivisible micro-batch, and persist the best-model snapshot
across a resume (VERDICT round-1 items #2 and #8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu import configs
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.parallel import make_mesh
from eilev_tpu.training import OptimizerConfig
from eilev_tpu.training.trainer import Trainer, TrainerConfig, shard_train_batch


pytestmark = pytest.mark.slow  # heavy equivalence/integration chain


def _fixed_batches(cfg, accum, micro_b, steps, seed=0):
    """Deterministic batch stream: same content regardless of the seed arg so
    two Trainers can be compared step for step."""
    img = cfg.vision_config.image_size
    q = cfg.num_query_tokens
    b = accum * micro_b

    def gen(_seed):
        rng = np.random.default_rng(seed)
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


@pytest.fixture(scope="module")
def setup():
    cfg = configs.tiny_config(text_model="opt")
    model = VideoBlipForConditionalGeneration(cfg)
    img = cfg.vision_config.image_size
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng,
        input_ids=jnp.ones((1, 12), jnp.int32),
        pixel_values=jax.random.normal(rng, (1, 3, 2, img, img)),
        video_input_mask=jnp.zeros((1, 12), jnp.int32)
        .at[:, 1 : 1 + cfg.num_query_tokens]
        .set(1),
    )["params"]
    return cfg, model, params


def _run(cfg, model, params, mesh, tmp_path, name, steps=2, zero=False):
    tconf = TrainerConfig(
        output_dir=str(tmp_path / name),
        num_train_steps=steps,
        gradient_accumulation_steps=1,
        optimizer=OptimizerConfig(learning_rate=1e-2, warmup_steps=0, total_steps=10),
        eval_steps=0,
        save_steps=0,
        log_steps=1,
        dropout=False,
        zero_shard_opt_state=zero,
    )
    losses = []
    trainer = Trainer(
        model,
        params,
        tconf,
        train_batches=_fixed_batches(cfg, 1, 8, steps=steps + 1),
        mesh=mesh,
        logger=lambda step, m: losses.append(m.get("loss")),
    )
    trainer.train()
    return trainer, losses


def test_trainer_tp_matches_replicated(setup, tmp_path):
    """scripts/train_v2.py --model_parallel 2 must produce the same training as
    pure DP: the TP layout is a performance choice, not a semantic one."""
    cfg, model, params = setup
    t_dp, loss_dp = _run(cfg, model, params, make_mesh(data=8, model=1), tmp_path, "dp")
    t_tp, loss_tp = _run(cfg, model, params, make_mesh(data=4, model=2), tmp_path, "tp")

    # the TP run actually sharded weights over "model"
    tp_leaves = [
        leaf
        for leaf in jax.tree.leaves(t_tp.frozen)
        if "model" in str(leaf.sharding.spec)
    ]
    assert tp_leaves, "no frozen param carries a 'model' sharding under TP"

    # the loss trajectory is the sharp check: step-2 loss depends on the step-1
    # update, so matching at 1e-4 proves forward AND backward TP==DP.
    np.testing.assert_allclose(loss_dp, loss_tp, rtol=1e-4)
    # Adam's normalizer amplifies reduction-order noise on near-zero grads
    # (update -> sign(g)*lr), so params only match loosely in absolute terms.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-3
        ),
        jax.device_get(t_dp.state.trainable),
        jax.device_get(t_tp.state.trainable),
    )


def test_trainer_zero_shards_opt_state(setup, tmp_path):
    cfg, model, params = setup
    trainer, loss_zero = _run(
        cfg, model, params, make_mesh(data=8, model=1), tmp_path, "zero", zero=True
    )
    specs = [
        str(leaf.sharding.spec)
        for leaf in jax.tree.leaves(trainer.state.opt_state)
        if hasattr(leaf, "sharding")
    ]
    assert any("data" in s for s in specs), specs
    # and the sharding survives the step (out_shardings pin): already asserted
    # post-train above. ZeRO must not change the math either:
    t_dp, loss_dp = _run(cfg, model, params, make_mesh(data=8, model=1), tmp_path, "dp2")
    np.testing.assert_allclose(loss_dp, loss_zero, rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-3
        ),
        jax.device_get(t_dp.state.trainable),
        jax.device_get(trainer.state.trainable),
    )


def test_indivisible_micro_batch_raises():
    mesh = make_mesh(data=8, model=1)
    bad = {"input_ids": np.ones((1, 3, 12), np.int64)}
    with pytest.raises(ValueError, match="does not divide"):
        shard_train_batch(bad, mesh)


def test_best_model_persists_across_resume(setup, tmp_path):
    """load_best_model_at_end must survive preemption: the best snapshot rides
    the orbax checkpoint (reference HF Trainer behavior, train_v2.py:205)."""
    cfg, model, params = setup
    eval_batch = {
        k: v[0] for k, v in next(iter(_fixed_batches(cfg, 1, 8, 1)(0))).items()
    }
    common = dict(
        gradient_accumulation_steps=1,
        optimizer=OptimizerConfig(learning_rate=1e-2, warmup_steps=0, total_steps=20),
        eval_steps=2,
        save_steps=2,
        log_steps=100,
        dropout=False,
    )
    trainer = Trainer(
        model,
        params,
        TrainerConfig(output_dir=str(tmp_path / "best"), num_train_steps=4, **common),
        train_batches=_fixed_batches(cfg, 1, 8, steps=10),
        eval_batches=lambda: iter([eval_batch]),
        mesh=make_mesh(data=8),
    )
    trainer.train()
    assert trainer.best_trainable is not None
    best_loss = trainer.best_eval_loss

    resumed = Trainer(
        model,
        params,
        TrainerConfig(
            output_dir=str(tmp_path / "best"),
            num_train_steps=4,
            resume_from_checkpoint=True,
            **common,
        ),
        train_batches=_fixed_batches(cfg, 1, 8, steps=10),
        eval_batches=lambda: iter([eval_batch]),
        mesh=make_mesh(data=8),
    )
    assert resumed.best_trainable is not None, "best snapshot lost on resume"
    assert resumed.best_eval_loss == pytest.approx(best_loss)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        jax.device_get(trainer.best_trainable),
        jax.device_get(resumed.best_trainable),
    )
