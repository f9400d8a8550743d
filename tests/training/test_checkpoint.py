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


def _sharded_state(trainable, mesh, *, tensor_parallel):
    """TrainState with TP param sharding + ZeRO opt-state sharding on mesh."""
    from eilev_tpu.parallel import param_shardings
    from eilev_tpu.training import zero_sharded_opt_state

    sh = param_shardings(trainable, mesh, tensor_parallel=tensor_parallel)
    placed = jax.tree.map(jax.device_put, trainable, sh)
    tx = optax.adamw(1e-3)
    state = TrainState.create(placed, tx)
    opt_sh = zero_sharded_opt_state(state, mesh)
    return state.replace(
        opt_state=jax.tree.map(jax.device_put, state.opt_state, opt_sh)
    )


@pytest.mark.slow
@pytest.mark.parametrize("target", ["dp_only", "tp_swapped"])
def test_checkpoint_reshard_across_meshes(setup, tmp_path, target):
    """Save under a TP(2)xDP(2) mesh with ZeRO-sharded opt state, restore onto
    a DIFFERENT layout — DP-only (8x1, e.g. dropping TP after a topology
    change) or TP-swapped (1x4, growing the model axis). The first thing a
    real pod does after resharding. Restored trainable + opt state must be
    bitwise-equal to the saved values, land with the TARGET mesh's shardings
    (orbax sharded restore, no host detour), and generate on the restored
    params must be token-identical to the pre-save model."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from eilev_tpu.generation import GenerationConfig, generate
    from eilev_tpu.parallel import make_mesh, param_shardings, shard_variables_for_inference
    from eilev_tpu.training import merge_params

    cfg, model, params = setup
    trainable, frozen = partition_params(params)

    mesh_a = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    state = _sharded_state(trainable, mesh_a, tensor_parallel=True)
    # one real AdamW update so mu/nu are non-trivial before the round trip
    grads = jax.tree.map(lambda x: jnp.full_like(x, 0.01), state.trainable)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.trainable)
    state = state.replace(
        step=jnp.asarray(7, jnp.int32),
        trainable=optax.apply_updates(state.trainable, updates),
        opt_state=new_opt,
    )
    ckpt_dir = str(tmp_path / "reshard")
    save_checkpoint(ckpt_dir, state, keep=1)
    saved_trainable = jax.device_get(state.trainable)
    saved_opt = jax.device_get(state.opt_state)

    if target == "dp_only":
        mesh_b = make_mesh(data=8, model=1)
        tp_b = False
    else:
        mesh_b = make_mesh(data=1, model=4, devices=jax.devices()[:4])
        tp_b = True
    fresh = _sharded_state(trainable, mesh_b, tensor_parallel=tp_b)
    restored = restore_checkpoint(latest_checkpoint(ckpt_dir), fresh)

    assert int(restored.step) == 7
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(restored.trainable), saved_trainable,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(restored.opt_state), saved_opt,
    )
    # restored leaves carry the TARGET layout (not the saved one)
    want_sh = param_shardings(restored.trainable, mesh_b, tensor_parallel=tp_b)
    jax.tree.map(
        lambda leaf, want: leaf.sharding.is_equivalent_to(want, leaf.ndim)
        or pytest.fail(f"{leaf.sharding} != {want}"),
        restored.trainable, want_sh,
    )

    # generate through the restored params on the target mesh: token-identical
    # to the pre-save (bumped) model executed unsharded
    bumped_params = merge_params(jax.device_get(state.trainable), frozen)
    rng = np.random.default_rng(5)
    img = cfg.vision_config.image_size
    q = cfg.num_query_tokens
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(1, 10))
    vim = np.zeros((1, 10), np.int64)
    vim[:, 1 : 1 + q] = 1
    pixel = rng.normal(size=(1, 3, 2, img, img)).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=4, pad_token_id=1)
    want = np.asarray(
        generate(
            model, {"params": bumped_params},
            input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim), generation_config=gen_cfg,
        )
    )
    restored_vars = shard_variables_for_inference(
        {"params": merge_params(restored.trainable, frozen)},
        mesh_b, tensor_parallel=tp_b,
    )
    got = np.asarray(
        generate(
            model, restored_vars,
            input_ids=jax.device_put(
                jnp.asarray(ids), NamedSharding(mesh_b, P())
            ),
            pixel_values=jax.device_put(
                jnp.asarray(pixel), NamedSharding(mesh_b, P())
            ),
            video_input_mask=jax.device_put(
                jnp.asarray(vim), NamedSharding(mesh_b, P())
            ),
            generation_config=gen_cfg,
        )
    )
    np.testing.assert_array_equal(got, want)


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
