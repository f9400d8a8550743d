"""VideoBLIP v1: single video per sample, video features PREPENDED to the text.

Parity target: the reference's v1 model (/root/reference/eilev/model/v1.py:95-119),
which inherits ``Blip2ForConditionalGeneration.forward/generate`` semantics of the
transformers release the reference pins (video query tokens concatenated in front
of the token embeddings, attention mask extended with ones, decoder-only loss
computed over the last ``labels.shape[1]`` logits).

Implemented as a subclass of the v2 module: same towers and params layout, only
the text/video composition differs, so v1 checkpoints convert with the same
``convert_videoblip``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..configs import OPTConfig
from .video_blip import (
    VideoBlipForConditionalGeneration,
    masked_cross_entropy,
    shift_tokens_right,
)


class VideoBlipV1ForConditionalGeneration(VideoBlipForConditionalGeneration):
    def embed_and_scatter(
        self,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array],
        video_input_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
        video_features: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        """v1 composition: [video features | token embeddings].

        Returns (inputs_embeds, num_prefix_tokens is implied by shape). One video
        per sample: pixel_values (B, C, T, H, W). ``video_features`` short-circuits
        the vision tower with precomputed ``encode_videos`` output ((B * Q, D)).
        """
        del video_input_mask  # v1 has no scatter mask; features are a prefix
        del deterministic
        inputs_embeds = self.language_model.embed(input_ids)
        if video_features is None:
            if pixel_values is None:
                return inputs_embeds
            video_features = self.encode_videos(pixel_values)  # (B * Q, D)
        features = video_features.reshape(
            inputs_embeds.shape[0], self.config.num_query_tokens, -1
        )
        return jnp.concatenate([features.astype(inputs_embeds.dtype), inputs_embeds], axis=1)

    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        pixel_values: Optional[jax.Array] = None,
        video_input_mask: Optional[jax.Array] = None,
        labels: Optional[jax.Array] = None,
        decoder_input_ids: Optional[jax.Array] = None,
        decoder_attention_mask: Optional[jax.Array] = None,
    ) -> dict[str, jax.Array]:
        cfg = self.config
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        inputs_embeds = self.embed_and_scatter(input_ids, pixel_values)
        if pixel_values is not None:
            prefix = jnp.ones((input_ids.shape[0], cfg.num_query_tokens), attention_mask.dtype)
            attention_mask = jnp.concatenate([prefix, attention_mask], axis=1)

        out: dict[str, jax.Array] = {}
        if isinstance(cfg.text_config, OPTConfig):
            logits, _ = self.language_model(inputs_embeds, attention_mask=attention_mask)
            out["logits"] = logits
            if labels is not None:
                # HF Blip2: loss over the last labels.shape[1] logits, shifted
                window = logits[:, -labels.shape[1] :]
                out["loss"] = masked_cross_entropy(window[:, :-1], labels[:, 1:])
        else:
            if decoder_input_ids is None and labels is not None:
                decoder_input_ids = shift_tokens_right(
                    labels, cfg.text_config.pad_token_id, cfg.text_config.decoder_start_token_id
                )
            logits = self.language_model(
                encoder_inputs_embeds=inputs_embeds,
                encoder_attention_mask=attention_mask,
                decoder_input_ids=decoder_input_ids,
                decoder_attention_mask=decoder_attention_mask,
            )
            out["logits"] = logits
            if labels is not None:
                out["loss"] = masked_cross_entropy(logits, labels)
        return out
