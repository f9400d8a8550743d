"""VideoBLIP / EILeV top-level model (v2: interleaved videos + text).

Parity target: ``VideoBlipForConditionalGeneration``
(/root/reference/eilev/model/v2.py:106-324): time-flattened vision tower ->
Q-Former over T*S image tokens -> linear projection -> video features scattered
into the token-embedding sequence at positions flagged by ``video_input_mask`` ->
OPT (causal) or T5 (seq2seq) language model.

The scatter (reference v2.py:206-214 does in-place boolean indexing) is expressed
here as a gather + select, which is jit-safe, differentiable, and static-shaped:
the i-th True position of ``video_input_mask`` (row-major over the batch) receives
``video_features[i]`` - the exact semantics of torch's ``tensor[mask] = values``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import OPTConfig, VideoBlipConfig
from .opt import OPTForCausalLM
from .qformer import QFormerModel
from .t5 import T5ForConditionalGeneration
from .vision import VideoVisionModel


def scatter_video_features(
    inputs_embeds: jax.Array, video_input_mask: jax.Array, video_features: jax.Array
) -> jax.Array:
    """Place video_features (N, D) at the True positions of video_input_mask (B, S)
    over inputs_embeds (B, S, D), row-major - torch ``embeds[mask] = feats``."""
    b, s, d = inputs_embeds.shape
    mask = video_input_mask.reshape(-1).astype(bool)
    idx = jnp.cumsum(mask.astype(jnp.int32)) - 1
    idx = jnp.clip(idx, 0, video_features.shape[0] - 1)
    gathered = video_features.astype(inputs_embeds.dtype)[idx]
    out = jnp.where(mask[:, None], gathered, inputs_embeds.reshape(b * s, d))
    return out.reshape(b, s, d)


class VideoBlipForConditionalGeneration(nn.Module):
    config: VideoBlipConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.vision_model = VideoVisionModel(cfg.vision_config, dtype=self.dtype, name="vision_model")
        self.query_tokens = self.param(
            "query_tokens",
            nn.initializers.zeros,
            (cfg.num_query_tokens, cfg.qformer_config.hidden_size),
            jnp.float32,
        )
        self.qformer = QFormerModel(cfg.qformer_config, dtype=self.dtype, name="qformer")
        self.language_projection = nn.Dense(
            cfg.text_hidden_size, dtype=self.dtype, name="language_projection"
        )
        if isinstance(cfg.text_config, OPTConfig):
            self.language_model: Any = OPTForCausalLM(
                cfg.text_config, dtype=self.dtype, name="language_model"
            )
        else:
            self.language_model = T5ForConditionalGeneration(
                cfg.text_config, dtype=self.dtype, name="language_model"
            )

    # ------------------------------------------------------------------
    # vision -> qformer -> projection
    # ------------------------------------------------------------------

    def encode_videos(self, pixel_values: jax.Array, deterministic: bool = True) -> jax.Array:
        """(num_videos, C, T, H, W) -> flattened (num_videos * num_query_tokens,
        text_hidden) video features, reference v2.py:166-203."""
        cfg = self.config
        image_embeds, _ = self.vision_model(pixel_values)  # (V, T*S, vision_hidden)
        v = image_embeds.shape[0]
        query = jnp.broadcast_to(
            self.query_tokens.astype(self.dtype),
            (v, cfg.num_query_tokens, cfg.qformer_config.hidden_size),
        )
        query_output = self.qformer(
            query, encoder_hidden_states=image_embeds, deterministic=deterministic
        )
        features = self.language_projection(query_output)  # (V, Q, text_hidden)
        return features.reshape(v * cfg.num_query_tokens, -1)

    def vision_forward(self, pixel_values: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Expose the raw video vision outputs (last_hidden (V,T*S,D), pooler (V,T,D)),
        matching reference VideoBlipVisionModel.forward (v2.py:24-103)."""
        return self.vision_model(pixel_values)

    def embed_and_scatter(
        self,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array],
        video_input_mask: Optional[jax.Array],
        deterministic: bool = True,
        video_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Token embeddings with video features scattered at the mask positions.

        ``video_features`` short-circuits the vision tower with precomputed
        ``encode_videos`` output ((num_videos * num_query_tokens, text_hidden)
        — e.g. from serving.VideoFeatureCache); the reference re-encodes every
        video on every call (v2.py:359-389, v2.py:285-316).
        """
        inputs_embeds = self.language_model.embed(input_ids)
        if video_features is not None:
            assert video_input_mask is not None
            return scatter_video_features(inputs_embeds, video_input_mask, video_features)
        if pixel_values is not None:
            assert video_input_mask is not None
            video_features = self.encode_videos(pixel_values, deterministic=deterministic)
            inputs_embeds = scatter_video_features(inputs_embeds, video_input_mask, video_features)
        return inputs_embeds

    # ------------------------------------------------------------------
    # training / scoring forward
    # ------------------------------------------------------------------

    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        pixel_values: Optional[jax.Array] = None,
        video_input_mask: Optional[jax.Array] = None,
        labels: Optional[jax.Array] = None,
        decoder_input_ids: Optional[jax.Array] = None,
        decoder_attention_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> dict[str, jax.Array]:
        """Returns {'logits', 'loss'?}; loss replicates HF's mean-over-valid-tokens
        cross entropy (reference v2.py:219-238 delegates to the HF LM)."""
        cfg = self.config
        inputs_embeds = self.embed_and_scatter(
            input_ids, pixel_values, video_input_mask, deterministic=deterministic
        )
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)

        out: dict[str, jax.Array] = {}
        if isinstance(cfg.text_config, OPTConfig):
            logits, _ = self.language_model(
                inputs_embeds, attention_mask=attention_mask, deterministic=deterministic
            )
            out["logits"] = logits
            if labels is not None:
                # HF causal-LM loss: shift by one, ignore -100.
                shift_logits = logits[:, :-1]
                shift_labels = labels[:, 1:]
                out["loss"] = masked_cross_entropy(shift_logits, shift_labels)
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
                deterministic=deterministic,
            )
            out["logits"] = logits
            if labels is not None:
                out["loss"] = masked_cross_entropy(logits, labels)
        return out

    # ------------------------------------------------------------------
    # LM plumbing used by the generation / classification loops
    # ------------------------------------------------------------------

    def lm_embed(self, input_ids: jax.Array) -> jax.Array:
        return self.language_model.embed(input_ids)

    def lm_forward(
        self,
        inputs_embeds: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        cache: Optional[dict] = None,
        cache_append: bool = False,
    ):
        return self.language_model(
            inputs_embeds, attention_mask=attention_mask, cache=cache,
            cache_append=cache_append,
        )

    def lm_score_with_prefix(
        self, class_embeds: jax.Array, class_attention_mask: jax.Array, cache: dict
    ) -> jax.Array:
        return self.language_model.score_with_prefix(class_embeds, class_attention_mask, cache)

    def lm_forward_hidden(
        self,
        inputs_embeds: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        cache: Optional[dict] = None,
    ):
        """lm_forward that also returns HF's ``hidden_states[-1]`` — the
        context representation contrastive search penalizes against."""
        return self.language_model(
            inputs_embeds, attention_mask=attention_mask, cache=cache,
            with_hidden=True,
        )

    def lm_candidates(self, cand_embeds: jax.Array, cache: dict):
        """Contrastive-search candidate expansion: (B, k) single-token
        candidates, all at the SAME next position, over a shared read-only
        cache (no duplication, no commitment) — ``score_with_prefix`` with
        C=k, L=1. Returns (logits (B,k,V), hidden (B,k,D))."""
        b, k, _ = cand_embeds.shape
        logits, hidden = self.language_model.score_with_prefix(
            cand_embeds[:, :, None, :],
            jnp.ones((b, k, 1), jnp.int32),
            cache,
            return_hidden=True,
        )
        return logits[:, :, 0], hidden[:, :, 0]

    def t5_encode(self, inputs_embeds: jax.Array, attention_mask: jax.Array) -> jax.Array:
        return self.language_model.encode(inputs_embeds, attention_mask)

    # ---- pipeline-parallel plumbing (training/pipeline_step.py) ----------

    def lm_pre_layers(self, inputs_embeds: jax.Array, attention_mask: jax.Array) -> jax.Array:
        return self.language_model.pre_layers(inputs_embeds, attention_mask)

    def lm_post_layers(self, x: jax.Array) -> jax.Array:
        return self.language_model.post_layers(x)

    def t5_encoder_rel_bias(self, s: int) -> jax.Array:
        return self.language_model.encoder_rel_bias(s)

    def t5_decoder_rel_bias(self, s: int) -> jax.Array:
        return self.language_model.decoder_rel_bias(s)

    def t5_encoder_post(self, x: jax.Array) -> jax.Array:
        return self.language_model.encoder_post(x)

    def t5_decoder_post(self, x: jax.Array) -> jax.Array:
        return self.language_model.decoder_post(x)

    def t5_decode_step(self, decoder_input_ids, encoder_hidden, encoder_attention_mask, cache):
        return self.language_model.decode_step(
            decoder_input_ids, encoder_hidden, encoder_attention_mask, cache
        )

    def t5_decode_step_hidden(
        self, decoder_input_ids, encoder_hidden, encoder_attention_mask, cache
    ):
        return self.language_model.decode_step_hidden(
            decoder_input_ids, encoder_hidden, encoder_attention_mask, cache
        )

    def t5_candidates(self, cand_ids, encoder_attention_mask, cache):
        return self.language_model.candidates(cand_ids, encoder_attention_mask, cache)

    def t5_decode_append(self, decoder_input_ids, encoder_attention_mask, cache, active):
        return self.language_model.decode_append(
            decoder_input_ids, encoder_attention_mask, cache, active
        )

    def t5_score_classes(
        self, class_decoder_ids, class_attention_mask, encoder_hidden, encoder_attention_mask
    ):
        return self.language_model.score_classes(
            class_decoder_ids, class_attention_mask, encoder_hidden, encoder_attention_mask
        )


def masked_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over positions where labels != -100 (HF convention)."""
    valid = labels != -100
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    token_loss = -jnp.where(valid, token_ll, 0.0)
    return token_loss.sum() / jnp.maximum(valid.sum(), 1)


def shift_tokens_right(labels: jax.Array, pad_token_id: int, decoder_start_token_id: int) -> jax.Array:
    """T5 decoder input preparation (HF ``_shift_right``): prepend start, drop last,
    replace -100 with pad."""
    shifted = jnp.roll(labels, 1, axis=-1)
    shifted = shifted.at[:, 0].set(decoder_start_token_id)
    return jnp.where(shifted == -100, pad_token_id, shifted)


def embed_and_scatter_chunked(
    model: "VideoBlipForConditionalGeneration",
    variables,
    input_ids: jax.Array,
    pixel_values: jax.Array,
    video_input_mask: jax.Array,
    *,
    vision_chunks: int = 1,
) -> jax.Array:
    """``embed_and_scatter`` with the vision+Q-Former stage run in
    ``vision_chunks`` sequential pieces (``lax.map`` = a scan, so XLA cannot
    overlap chunks and the activation peak is 1/chunks of the monolithic run).

    Why: the ViT is compute-bound — chunking costs nothing — but its
    activations are the HBM peak of the serving step. At the flagship
    geometry one v5e chip fits a 4-datapoint (68-video) batch monolithically;
    an 8-datapoint batch spills and collapses throughput (measured 25.7 ->
    6.1 videos/s). Chunking restores large-batch serving, which matters
    because the 32-layer OPT decode step is weight-read-bound and amortizes
    over batch. Function-level (not flax-level) so the param tree stays
    identical to the reference checkpoint mapping.
    """
    cls = type(model)
    if vision_chunks <= 1:
        return model.apply(
            variables, input_ids, pixel_values, video_input_mask,
            method=cls.embed_and_scatter,
        )
    v = pixel_values.shape[0]
    if v % vision_chunks != 0:
        raise ValueError(
            f"vision_chunks={vision_chunks} must divide the number of videos "
            f"in the batch ({v}); pick a divisor of the video count"
        )
    chunked = pixel_values.reshape(vision_chunks, v // vision_chunks, *pixel_values.shape[1:])
    feats = jax.lax.map(
        lambda px: model.apply(variables, px, method=cls.encode_videos), chunked
    )  # (chunks, chunk_v * Q, D)
    feats = feats.reshape(-1, feats.shape[-1])
    embeds = model.apply(variables, input_ids, method=cls.lm_embed)
    return scatter_video_features(embeds, video_input_mask, feats)
