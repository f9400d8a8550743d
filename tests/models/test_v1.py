"""VideoBLIP v1 parity: prepend semantics vs a manually-composed torch oracle.

The installed transformers changed Blip2's composition to image-token placeholders,
so the oracle is built by hand from the same HF submodules, following the
reference-era ``Blip2ForConditionalGeneration.forward`` the reference's v1 inherits
(/root/reference/eilev/model/v1.py:95-119): features prepended, mask extended,
decoder-only loss over the last labels-length window.
"""

import jax.numpy as jnp
import numpy as np
import torch

from eilev_tpu.generation import GenerationConfig, generate
from eilev_tpu.models.video_blip_v1 import VideoBlipV1ForConditionalGeneration

from .hf_util import make_oracle, t2n


def _oracle_v1_prefix(model, pixel, ids, mask):
    """Reference-era Blip2 composition by hand from HF submodules."""
    with torch.no_grad():
        image_embeds = model.vision_model(pixel_values=pixel, return_dict=True).last_hidden_state
        query_tokens = model.query_tokens.expand(image_embeds.shape[0], -1, -1)
        query_out = model.qformer(
            query_embeds=query_tokens,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=torch.ones(image_embeds.size()[:-1], dtype=torch.long),
            return_dict=True,
        ).last_hidden_state
        feats = model.language_projection(query_out)
        text_embeds = model.language_model.get_input_embeddings()(ids)
        embeds = torch.cat([feats, text_embeds], dim=1)
        full_mask = torch.cat([torch.ones(feats.shape[:2], dtype=mask.dtype), mask], dim=1)
        return embeds, full_mask


def test_v1_forward_and_loss_parity():
    model, cfg, params = make_oracle("opt")
    rng = np.random.default_rng(21)
    b, t, s = 2, 2, 10
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(b, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    labels = ids.copy()
    labels[:, :4] = -100  # prompt masked, like generate_input_ids_and_labels

    embeds, full_mask = _oracle_v1_prefix(
        model, torch.tensor(pixel), torch.tensor(ids), torch.tensor(mask)
    )
    with torch.no_grad():
        ref_logits = model.language_model(
            inputs_embeds=embeds, attention_mask=full_mask, return_dict=True
        ).logits
        window = ref_logits[:, -s:]
        loss_fct = torch.nn.CrossEntropyLoss()
        ref_loss = loss_fct(
            window[:, :-1].reshape(-1, cfg.text_config.vocab_size),
            torch.tensor(labels)[:, 1:].reshape(-1),
        )

    m = VideoBlipV1ForConditionalGeneration(cfg)
    out = m.apply(
        {"params": params},
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        pixel_values=jnp.asarray(pixel),
        labels=jnp.asarray(labels),
    )
    np.testing.assert_allclose(np.asarray(out["logits"]), t2n(ref_logits), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(float(out["loss"]), float(ref_loss), atol=1e-4, rtol=1e-4)


def test_v1_greedy_generate_parity():
    model, cfg, params = make_oracle("opt")
    rng = np.random.default_rng(22)
    b, t, s = 2, 2, 6
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(b, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)

    embeds, full_mask = _oracle_v1_prefix(
        model, torch.tensor(pixel), torch.tensor(ids), torch.tensor(mask)
    )
    with torch.no_grad():
        ref = model.language_model.generate(
            inputs_embeds=embeds,
            attention_mask=full_mask,
            max_new_tokens=6,
            do_sample=False,
        ).numpy()

    m = VideoBlipV1ForConditionalGeneration(cfg)
    ours = np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            generation_config=GenerationConfig(
                max_new_tokens=6, pad_token_id=cfg.text_config.pad_token_id
            ),
        )
    )
    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])
