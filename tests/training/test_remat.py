"""Per-layer remat of the frozen LM trunk (configs.OPTConfig.remat /
T5Config.remat) must not change the training step's numbers — only the
backward pass's memory profile. Gradients flow THROUGH the frozen LM to the
scattered video features (train_state.py), so the LM's per-layer
attention/MLP intermediates are what remat stops saving; the loss and the
Q-Former gradients must be identical either way, including with the
reference's dropout active (flax's lifted remat replays the dropout rng).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu import configs
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.training import merge_params, partition_params


pytestmark = pytest.mark.slow  # heavy equivalence/integration chain


def _data(cfg, text_model, b=2, seq=16, seed=0):
    rng = np.random.default_rng(seed)
    img = cfg.vision_config.image_size
    q = cfg.num_query_tokens
    pixel = jnp.asarray(rng.normal(size=(b, 3, 2, img, img)).astype(np.float32))
    ids = jnp.asarray(rng.integers(4, cfg.text_config.vocab_size, size=(b, seq)))
    vim = np.zeros((b, seq), np.int64)
    vim[:, 1 : 1 + q] = 1
    vim = jnp.asarray(vim)
    if text_model == "opt":
        labels = jnp.where(vim.astype(bool), -100, ids)
    else:  # seq2seq: labels are the (clean) target sequence
        labels = jnp.asarray(
            rng.integers(4, cfg.text_config.vocab_size, size=(b, seq))
        )
    return pixel, ids, vim, labels


@pytest.mark.parametrize("text_model", ["opt", "t5"])
def test_remat_loss_and_grads_match_plain(text_model):
    cfg = configs.tiny_config(text_model=text_model)
    model = VideoBlipForConditionalGeneration(cfg)
    rcfg = configs.replace(
        cfg, text_config=dataclasses.replace(cfg.text_config, remat=True)
    )
    rmodel = VideoBlipForConditionalGeneration(rcfg)

    pixel, ids, vim, labels = _data(cfg, text_model)
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=ids,
        pixel_values=pixel,
        video_input_mask=vim,
        labels=labels,
    )["params"]
    trainable, frozen = partition_params(params)

    def make_loss(mod):
        def f(tr, key):
            p = merge_params(tr, frozen)
            return mod.apply(
                {"params": p},
                input_ids=ids,
                pixel_values=pixel,
                video_input_mask=vim,
                labels=labels,
                deterministic=key is None,
                rngs={"dropout": key} if key is not None else {},
            )["loss"]

        return f

    def compare(key):
        l0, g0 = jax.value_and_grad(make_loss(model))(trainable, key)
        l1, g1 = jax.value_and_grad(make_loss(rmodel))(trainable, key)
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)
        leaves0 = jax.tree_util.tree_leaves_with_path(g0)
        leaves1 = jax.tree.leaves(g1)
        assert len(leaves0) == len(leaves1)
        grad_norm = 0.0
        # Tolerances: the T5 remat body recomputes the cross-attention K/V
        # inside the checkpointed region, so XLA fuses those matmuls
        # differently and fp32 reduction order shifts by a few ulps (measured
        # max ~1e-4 relative to the leaf scale; elements suffering
        # catastrophic cancellation show more element-wise, hence the
        # leaf-scaled atol). A broken rng replay would show O(1) errors.
        for (path, a), b in zip(leaves0, leaves1):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(float(np.max(np.abs(a))), 1.0)
            np.testing.assert_allclose(
                a, b, rtol=2e-4, atol=1e-4 * scale,
                err_msg=jax.tree_util.keystr(path),
            )
            grad_norm += float(jnp.sum(jnp.square(a)))
        assert grad_norm > 0.0  # gradients actually flow through the frozen LM

    compare(None)  # deterministic
    compare(jax.random.PRNGKey(7))  # dropout active: remat must replay the rng


def test_remat_param_tree_unchanged():
    """remat=True must not change the parameter structure (checkpoints and HF
    conversion stay valid)."""
    cfg = configs.tiny_config(text_model="opt")
    rcfg = configs.replace(
        cfg, text_config=dataclasses.replace(cfg.text_config, remat=True)
    )
    model = VideoBlipForConditionalGeneration(cfg)
    rmodel = VideoBlipForConditionalGeneration(rcfg)
    pixel, ids, vim, _ = _data(cfg, "opt")
    p0 = model.init(
        jax.random.PRNGKey(0), input_ids=ids, pixel_values=pixel, video_input_mask=vim
    )["params"]
    p1 = rmodel.init(
        jax.random.PRNGKey(0), input_ids=ids, pixel_values=pixel, video_input_mask=vim
    )["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
