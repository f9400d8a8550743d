"""Numerical parity of each tower against tiny random-weight HF/reference oracles.

These tests are the analogue of the reference's tiny-config shape tests
(/root/reference/tests/model/test_model_v2.py) but strictly stronger: they check
values, not just shapes, at fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from eilev_tpu.models.opt import OPTForCausalLM
from eilev_tpu.models.qformer import QFormerModel
from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration
from eilev_tpu.models.vision import VideoVisionModel

from .hf_util import make_oracle, t2n

ATOL = 2e-4
RTOL = 2e-4


@pytest.fixture(scope="module")
def opt_oracle():
    return make_oracle("opt")


def test_vision_parity(opt_oracle):
    model, cfg, params = opt_oracle
    v, t = 3, 2
    rng = np.random.default_rng(0)
    pixel = rng.normal(size=(v, 3, t, cfg.vision_config.image_size, cfg.vision_config.image_size)).astype(np.float32)

    with torch.no_grad():
        ref = model.vision_model(pixel_values=torch.tensor(pixel), return_dict=True)

    m = VideoVisionModel(cfg.vision_config)
    last, pooled = m.apply({"params": params["vision_model"]}, jnp.asarray(pixel))

    np.testing.assert_allclose(np.asarray(last), t2n(ref.last_hidden_state), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(pooled), t2n(ref.pooler_output), atol=ATOL, rtol=RTOL)
    # shape contract from reference v2.py:24-103
    s = cfg.vision_config.seq_len
    assert last.shape == (v, t * s, cfg.vision_config.hidden_size)
    assert pooled.shape == (v, t, cfg.vision_config.hidden_size)


def test_qformer_parity(opt_oracle):
    model, cfg, params = opt_oracle
    v = 2
    kv_len = 10
    rng = np.random.default_rng(1)
    query = rng.normal(size=(v, cfg.num_query_tokens, cfg.qformer_config.hidden_size)).astype(np.float32)
    enc = rng.normal(size=(v, kv_len, cfg.qformer_config.encoder_hidden_size)).astype(np.float32)

    with torch.no_grad():
        ref = model.qformer(
            query_embeds=torch.tensor(query),
            encoder_hidden_states=torch.tensor(enc),
            encoder_attention_mask=torch.ones(v, kv_len, dtype=torch.long),
            return_dict=True,
        ).last_hidden_state

    m = QFormerModel(cfg.qformer_config)
    out = m.apply(
        {"params": params["qformer"]},
        jnp.asarray(query),
        encoder_hidden_states=jnp.asarray(enc),
        encoder_attention_mask=jnp.ones((v, kv_len), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(out), t2n(ref), atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize("left_pad", [0, 3])
def test_opt_parity(opt_oracle, left_pad):
    model, cfg, params = opt_oracle
    b, s = 2, 12
    rng = np.random.default_rng(2)
    tcfg = cfg.text_config
    ids = rng.integers(0, tcfg.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    if left_pad:
        mask[0, :left_pad] = 0

    with torch.no_grad():
        ref = model.language_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask), return_dict=True
        ).logits

    m = OPTForCausalLM(tcfg)
    variables = {"params": params["language_model"]}
    embeds = m.apply(variables, jnp.asarray(ids), method=OPTForCausalLM.embed)
    logits, _ = m.apply(variables, embeds, attention_mask=jnp.asarray(mask))
    # compare only attended positions (padded rows differ harmlessly)
    ours = np.asarray(logits)
    refs = t2n(ref)
    sel = mask.astype(bool)
    np.testing.assert_allclose(ours[sel], refs[sel], atol=ATOL, rtol=RTOL)


def test_videoblip_v2_forward_parity(opt_oracle):
    model, cfg, params = opt_oracle
    b, v_per, t, s = 2, 2, 2, 24
    img = cfg.vision_config.image_size
    rng = np.random.default_rng(3)
    num_videos = b * v_per
    pixel = rng.normal(size=(num_videos, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(0, cfg.text_config.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    vim = np.zeros((b, s), np.int64)
    q = cfg.num_query_tokens
    vim[:, 1 : 1 + v_per * q] = 1  # v_per videos x q query tokens per sample
    labels = ids.copy()
    labels[vim.astype(bool)] = -100

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixel),
            video_input_mask=torch.tensor(vim),
            labels=torch.tensor(labels),
            return_dict=True,
        )

    m = VideoBlipForConditionalGeneration(cfg)
    out = m.apply(
        {"params": params},
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
        labels=jnp.asarray(labels),
    )
    np.testing.assert_allclose(np.asarray(out["logits"]), t2n(ref.logits), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(float(out["loss"]), float(ref.loss), atol=1e-4, rtol=1e-4)


def test_scatter_semantics():
    """The gather+select scatter must equal torch's boolean-mask assignment."""
    from eilev_tpu.models.video_blip import scatter_video_features

    rng = np.random.default_rng(4)
    b, s, d, n = 2, 7, 5, 6
    embeds = rng.normal(size=(b, s, d)).astype(np.float32)
    feats = rng.normal(size=(n, d)).astype(np.float32)
    mask = np.zeros((b, s), np.int64)
    mask[0, 1:4] = 1
    mask[1, 2:5] = 1

    te = torch.tensor(embeds.copy())
    te[torch.tensor(mask).bool()] = torch.tensor(feats)

    ours = scatter_video_features(jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(ours), te.numpy(), atol=0, rtol=0)


@pytest.mark.slow
def test_videoblip_t5_forward_parity():
    model, cfg, params = make_oracle("t5")
    b, v_per, t, s = 2, 1, 2, 10
    img = cfg.vision_config.image_size
    rng = np.random.default_rng(5)
    pixel = rng.normal(size=(b * v_per, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(0, cfg.text_config.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    vim = np.zeros((b, s), np.int64)
    vim[:, : cfg.num_query_tokens] = 1
    labels = rng.integers(0, cfg.text_config.vocab_size, size=(b, 6))

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixel),
            video_input_mask=torch.tensor(vim),
            labels=torch.tensor(labels),
            return_dict=True,
        )

    m = VideoBlipForConditionalGeneration(cfg)
    out = m.apply(
        {"params": params},
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
        labels=jnp.asarray(labels),
    )
    np.testing.assert_allclose(np.asarray(out["logits"]), t2n(ref.logits), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(float(out["loss"]), float(ref.loss), atol=1e-4, rtol=1e-4)


def test_embed_and_scatter_chunked_matches_monolithic():
    """Function-level vision chunking (serving memory lever) is bit-equivalent
    to the monolithic embed_and_scatter."""
    import numpy as np

    from eilev_tpu import configs
    from eilev_tpu.models import VideoBlipForConditionalGeneration
    from eilev_tpu.models.video_blip import embed_and_scatter_chunked

    cfg = configs.tiny_config(text_model="opt")
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    b, s = 2, 20
    v = 4  # videos total (2 per sample)
    img = cfg.vision_config.image_size
    pixel = jnp.asarray(rng.normal(size=(v, 3, 2, img, img)), jnp.float32)
    ids = jnp.asarray(rng.integers(4, cfg.text_config.vocab_size, size=(b, s)), jnp.int32)
    vim = np.zeros((b, s), np.int32)
    vim[:, 1 : 1 + 2 * cfg.num_query_tokens] = 1
    vim = jnp.asarray(vim)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=ids, pixel_values=pixel, video_input_mask=vim
    )["params"]
    variables = {"params": params}
    ref = model.apply(
        variables, ids, pixel, vim, method=VideoBlipForConditionalGeneration.embed_and_scatter
    )
    for chunks in (1, 2, 4):
        got = embed_and_scatter_chunked(
            model, variables, ids, pixel, vim, vision_chunks=chunks
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)
