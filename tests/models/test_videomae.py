"""VideoMAE classifier parity vs a tiny random-weight HF oracle."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from eilev_tpu.models.videomae import (
    VideoMAEConfig,
    VideoMAEForVideoClassification,
    convert_videomae,
)


@pytest.fixture(scope="module")
def oracle():
    from transformers import VideoMAEConfig as HFConfig
    from transformers import VideoMAEForVideoClassification as HFModel

    cfg = VideoMAEConfig(
        image_size=32,
        patch_size=16,
        num_frames=4,
        tubelet_size=2,
        hidden_size=24,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=48,
        num_labels=5,
    )
    hf_cfg = HFConfig(
        image_size=32,
        patch_size=16,
        num_frames=4,
        tubelet_size=2,
        hidden_size=24,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=48,
        num_labels=5,
        use_mean_pooling=True,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    params = convert_videomae(hf.state_dict(), cfg)
    return hf, cfg, params


def test_videomae_logits_parity(oracle):
    hf, cfg, params = oracle
    rng = np.random.default_rng(0)
    # framework layout (B, C, T, H, W); HF takes (B, T, C, H, W)
    pixel = rng.normal(size=(2, 3, 4, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(pixel.transpose(0, 2, 1, 3, 4))).logits

    m = VideoMAEForVideoClassification(cfg)
    out = m.apply({"params": params}, jnp.asarray(pixel))
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref.numpy(), atol=2e-4, rtol=2e-4
    )


def test_videomae_loss(oracle):
    hf, cfg, params = oracle
    rng = np.random.default_rng(1)
    pixel = rng.normal(size=(2, 3, 4, 32, 32)).astype(np.float32)
    labels = np.array([1, 3])
    with torch.no_grad():
        ref = hf(
            pixel_values=torch.tensor(pixel.transpose(0, 2, 1, 3, 4)),
            labels=torch.tensor(labels),
        )
    m = VideoMAEForVideoClassification(cfg)
    out = m.apply({"params": params}, jnp.asarray(pixel), labels=jnp.asarray(labels))
    np.testing.assert_allclose(float(out["loss"]), float(ref.loss), atol=1e-5, rtol=1e-5)
