"""Training-step tests: freeze semantics, grad-accum equivalence, and SPMD
data-parallel / tensor-parallel execution on the 8-device virtual CPU mesh
(the multi-device coverage the reference never had - SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from eilev_tpu import configs
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.parallel import make_mesh, param_shardings, shard_batch
from eilev_tpu.training import (
    OptimizerConfig,
    TrainState,
    make_optimizer,
    make_train_step,
    merge_params,
    partition_params,
)


pytestmark = pytest.mark.slow  # heavy equivalence/integration chain


def _tiny_batch(cfg, accum, micro_b, videos_per_sample=1, seq=16, seed=0):
    rng = np.random.default_rng(seed)
    img = cfg.vision_config.image_size
    q = cfg.num_query_tokens
    b = accum * micro_b
    nv = b * videos_per_sample
    pixel = rng.normal(size=(nv, 3, 2, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, seq))
    vim = np.zeros((b, seq), np.int64)
    vim[:, 1 : 1 + videos_per_sample * q] = 1
    labels = np.where(vim.astype(bool), -100, ids)
    mask = np.ones((b, seq), np.int64)

    def r(x, extra=()):  # add accum leading axis
        return x.reshape(accum, micro_b, *extra, *x.shape[1:])

    return {
        "input_ids": r(ids),
        "attention_mask": r(mask),
        "labels": r(labels),
        "video_input_mask": r(vim),
        "pixel_values": pixel.reshape(accum, micro_b * videos_per_sample, *pixel.shape[1:]),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = configs.tiny_config(text_model="opt")
    model = VideoBlipForConditionalGeneration(cfg)
    batch = _tiny_batch(cfg, accum=1, micro_b=2)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng,
        input_ids=jnp.asarray(batch["input_ids"][0]),
        pixel_values=jnp.asarray(batch["pixel_values"][0]),
        video_input_mask=jnp.asarray(batch["video_input_mask"][0]),
    )["params"]
    return cfg, model, params


def test_partition_covers_reference_freeze_list(setup):
    _, _, params = setup
    trainable, frozen = partition_params(params)
    assert set(trainable) == {"query_tokens", "qformer", "language_projection"}
    assert set(frozen) == {"vision_model", "language_model"}
    merged = merge_params(trainable, frozen)
    assert jax.tree.all(jax.tree.map(lambda a, b: (a == b).all(), merged, params))


def test_train_step_updates_only_trainable_and_learns(setup):
    cfg, model, params = setup
    trainable, frozen = partition_params(params)
    tx = make_optimizer(OptimizerConfig(learning_rate=5e-3, warmup_steps=0, total_steps=100))
    state = TrainState.create(trainable, tx)
    step = jax.jit(make_train_step(model, accum_steps=1, dropout=False))
    batch = jax.tree.map(jnp.asarray, _tiny_batch(cfg, 1, 2))

    losses = []
    for _ in range(8):
        state, metrics = step(state, frozen, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.05, losses
    # trainable changed, frozen untouched by construction
    assert not jax.tree.all(
        jax.tree.map(lambda a, b: jnp.allclose(a, b), state.trainable, trainable)
    )


def test_grad_accum_equivalence(setup):
    """accum=2 over half-batches == accum=1 over the full batch (uniform label
    counts make mean-of-means equal the global mean)."""
    cfg, model, params = setup
    trainable, frozen = partition_params(params)
    tx = optax.sgd(1e-2)

    batch = _tiny_batch(cfg, accum=2, micro_b=1, seed=3)
    flat = {
        k: jnp.asarray(v.reshape(1, -1, *v.shape[2:])) for k, v in batch.items()
    }
    batch = jax.tree.map(jnp.asarray, batch)

    s1 = TrainState.create(trainable, tx)
    s2 = TrainState.create(trainable, tx)
    step_accum = jax.jit(make_train_step(model, accum_steps=2, dropout=False))
    step_flat = jax.jit(make_train_step(model, accum_steps=1, dropout=False))
    s1, m1 = step_accum(s1, frozen, batch)
    s2, m2 = step_flat(s2, frozen, flat)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # reduction order differs (scan-accumulated vs batched mean): tiny float noise
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        ),
        s1.trainable,
        s2.trainable,
    )


def test_data_parallel_matches_single_device(setup):
    cfg, model, params = setup
    trainable, frozen = partition_params(params)
    tx = optax.sgd(1e-2)
    batch = _tiny_batch(cfg, accum=1, micro_b=8, seed=5)

    # single device
    s0 = TrainState.create(trainable, tx)
    step = jax.jit(make_train_step(model, accum_steps=1, dropout=False))
    s0, m0 = step(s0, frozen, jax.tree.map(jnp.asarray, batch))

    # 8-way DP: shard the microbatch axis 1 over 'data'
    mesh = make_mesh(data=8, model=1)
    dp = NamedSharding(mesh, P(None, "data"))
    sharded = {
        k: jax.device_put(jnp.asarray(v), dp) for k, v in batch.items()
    }
    rep = NamedSharding(mesh, P())
    s1 = TrainState.create(jax.device_put(trainable, rep), tx)
    frozen_r = jax.device_put(frozen, rep)
    s1, m1 = step(s1, frozen_r, sharded)

    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)
    # cross-device psum vs single-device sum: reduction-order float noise only
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        ),
        s0.trainable,
        s1.trainable,
    )


def test_tensor_parallel_forward_matches_replicated(setup):
    cfg, model, params = setup
    mesh = make_mesh(data=4, model=2)
    shardings = param_shardings(params, mesh, tensor_parallel=True)
    sharded_params = jax.tree.map(jax.device_put, params, shardings)

    batch = _tiny_batch(cfg, accum=1, micro_b=4, seed=7)
    micro = {k: jnp.asarray(v[0]) for k, v in batch.items()}
    micro = shard_batch(micro, mesh)

    @jax.jit
    def fwd(p, m):
        return model.apply(
            {"params": p},
            input_ids=m["input_ids"],
            attention_mask=m["attention_mask"],
            pixel_values=m["pixel_values"],
            video_input_mask=m["video_input_mask"],
            labels=m["labels"],
        )["loss"]

    loss_tp = float(fwd(sharded_params, micro))
    loss_ref = float(fwd(params, {k: jnp.asarray(v[0]) for k, v in batch.items()}))
    np.testing.assert_allclose(loss_tp, loss_ref, rtol=2e-5)


def test_param_ema_tracks_and_checkpoints(setup, tmp_path):
    """ema_decay: the optimizer-state EMA follows the exact recurrence and
    round-trips through the orbax checkpoint unchanged."""
    import optax

    from eilev_tpu.training import OptimizerConfig, ema_params, make_optimizer
    from eilev_tpu.training.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    cfg, model, params = setup
    batch = jax.tree.map(jnp.asarray, _tiny_batch(cfg, accum=1, micro_b=2))
    trainable, frozen = partition_params(params)
    decay = 0.8
    tx = make_optimizer(
        OptimizerConfig(learning_rate=1e-2, warmup_steps=0, total_steps=10,
                        ema_decay=decay)
    )
    state = TrainState.create(trainable, tx)
    # ema starts equal to the params
    jax.tree.map(
        lambda e, p: np.testing.assert_array_equal(np.asarray(e), np.asarray(p)),
        ema_params(state), state.trainable,
    )
    step = jax.jit(make_train_step(model, accum_steps=1, dropout=False))
    expected_ema = jax.tree.map(lambda x: np.asarray(x, np.float64), trainable)
    for _ in range(3):
        state, _ = step(state, frozen, batch)
        expected_ema = jax.tree.map(
            lambda e, p: decay * e + (1 - decay) * np.asarray(p, np.float64),
            expected_ema, state.trainable,
        )
    jax.tree.map(
        lambda e, x: np.testing.assert_allclose(
            np.asarray(e, np.float64), x, rtol=1e-5, atol=1e-6
        ),
        ema_params(state), expected_ema,
    )
    # checkpoint round trip carries the EMA (it lives in opt_state)
    ckpt = str(tmp_path / "ema_ckpt")
    save_checkpoint(ckpt, state, keep=1)
    fresh = TrainState.create(trainable, tx)
    restored = restore_checkpoint(latest_checkpoint(ckpt), fresh)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ema_params(restored), ema_params(state),
    )
