"""Checkpoint tests: orbax save/restore/prune/resume + HF safetensors round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from eilev_tpu import configs
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.models.convert import convert_videoblip
from eilev_tpu.training import TrainState, partition_params
from eilev_tpu.training.checkpoint import (
    export_hf_safetensors,
    hf_state_dict,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def setup():
    cfg = configs.tiny_config(text_model="opt")
    model = VideoBlipForConditionalGeneration(cfg)
    rng = jax.random.PRNGKey(0)
    img = cfg.vision_config.image_size
    params = model.init(
        rng,
        input_ids=jnp.ones((1, 8), jnp.int32),
        pixel_values=jax.random.normal(rng, (1, 3, 2, img, img)),
        video_input_mask=jnp.zeros((1, 8), jnp.int32).at[:, : cfg.num_query_tokens].set(1),
    )["params"]
    return cfg, model, params


def test_orbax_roundtrip_and_prune(setup, tmp_path):
    _, _, params = setup
    trainable, _ = partition_params(params)
    tx = optax.adam(1e-3)
    state = TrainState.create(trainable, tx)

    ckpt_dir = str(tmp_path / "ckpts")
    for step in [1, 2, 3, 4, 5]:
        bumped = jax.tree.map(lambda x: x + 1.0, state.trainable)
        state = state.replace(step=jnp.asarray(step, jnp.int32), trainable=bumped)
        save_checkpoint(ckpt_dir, state, keep=3)

    latest = latest_checkpoint(ckpt_dir)
    assert latest.endswith("/5")
    import os

    assert sorted(os.listdir(ckpt_dir)) == ["3", "4", "5"]

    fresh = TrainState.create(trainable, tx)
    restored = restore_checkpoint(latest, fresh)
    assert int(restored.step) == 5
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.trainable,
        state.trainable,
    )


def test_hf_safetensors_roundtrip(setup, tmp_path):
    """export -> convert must reproduce every parameter exactly, proving the
    exporter writes checkpoints the torch reference can consume."""
    cfg, _, params = setup
    path = str(tmp_path / "hf")
    export_hf_safetensors(params, cfg, path)

    from safetensors.numpy import load_file

    sd = load_file(path + "/model.safetensors")
    back = convert_videoblip(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    # same structure
    assert jax.tree.structure(params) == jax.tree.structure(back)
    for path_k, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(dict(flat_b)[path_k]), atol=0, rtol=0,
            err_msg=str(path_k),
        )


def test_hf_export_t5_roundtrip(tmp_path):
    cfg = configs.tiny_config(text_model="t5")
    model = VideoBlipForConditionalGeneration(cfg)
    rng = jax.random.PRNGKey(1)
    img = cfg.vision_config.image_size
    params = model.init(
        rng,
        input_ids=jnp.ones((1, 8), jnp.int32),
        pixel_values=jax.random.normal(rng, (1, 3, 2, img, img)),
        video_input_mask=jnp.zeros((1, 8), jnp.int32).at[:, : cfg.num_query_tokens].set(1),
        labels=jnp.ones((1, 4), jnp.int32),
    )["params"]
    sd = hf_state_dict(params, cfg)
    back = convert_videoblip(sd, cfg)
    assert jax.tree.structure(params) == jax.tree.structure(back)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        back,
    )


def test_async_writer_roundtrip_and_prune(setup, tmp_path):
    """AsyncCheckpointWriter: overlapped saves commit the same bytes as the
    blocking path, one-in-flight serialization works, prune applies on wait."""
    import os

    from eilev_tpu.training.checkpoint import AsyncCheckpointWriter

    _, _, params = setup
    trainable, _ = partition_params(params)
    tx = optax.adam(1e-3)
    state = TrainState.create(trainable, tx)

    ckpt_dir = str(tmp_path / "async_ckpts")
    writer = AsyncCheckpointWriter()
    states = {}
    for step in [1, 2, 3, 4]:
        bumped = jax.tree.map(lambda x: x + 1.0, state.trainable)
        state = state.replace(step=jnp.asarray(step, jnp.int32), trainable=bumped)
        states[step] = state
        writer.save(ckpt_dir, state, keep=2, best=(0.5, state.trainable))
    writer.wait()
    writer.wait()  # idempotent

    assert sorted(os.listdir(ckpt_dir)) == ["3", "4"]
    latest = latest_checkpoint(ckpt_dir)
    fresh = TrainState.create(trainable, tx)
    restored, best = restore_checkpoint(latest, fresh, with_best=True)
    assert int(restored.step) == 4
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.trainable,
        states[4].trainable,
    )
    assert best is not None and best[0] == 0.5
