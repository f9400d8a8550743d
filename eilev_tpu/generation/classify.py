"""Log-likelihood N-way classification with prompt KV-cache reuse.

Parity target: ``VideoBlipForConditionalGeneration.classify``
(/root/reference/eilev/model/v2.py:326-501): run the (left-padded) few-shot prompt
once with a KV cache, then score every class continuation and return the
per-class mean log-likelihood.

TPU-native difference: the reference expands the prompt KV cache with
``repeat_interleave`` to batch * num_classes copies (v2.py:457-459) - the memory
hot spot of the ICL eval. Here the class continuations attend the *shared* prompt
cache through ``OPTForCausalLM.score_with_prefix``, so the cache is never
duplicated; ``class_batch_size`` only bounds the (B, C, H, L, P) score tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import opt as opt_mod
from ..models.video_blip import VideoBlipForConditionalGeneration as VB


@functools.partial(jax.jit, static_argnames=("model",))
def _encode_prompt_seq2seq(
    model: VB, variables, input_ids, attention_mask, pixel_values, video_input_mask,
    video_features=None,
):
    inputs_embeds = model.apply(
        variables, input_ids, pixel_values, video_input_mask,
        method=VB.embed_and_scatter, video_features=video_features,
    )
    return model.apply(variables, inputs_embeds, attention_mask, method=VB.t5_encode)


@functools.partial(jax.jit, static_argnames=("model",))
def _score_classes_seq2seq(
    model: VB, variables, class_input_ids, class_attention_mask, encoder_hidden, encoder_mask
):
    """Seq2seq classify: score (C, L) class label sequences against the shared
    encoder states (additive — the reference asserts decoder-only, v2.py:351)."""
    from ..models.video_blip import shift_tokens_right

    tcfg = model.config.text_config
    dec_in = shift_tokens_right(class_input_ids, tcfg.pad_token_id, tcfg.decoder_start_token_id)
    logits = model.apply(
        variables, dec_in, class_attention_mask, encoder_hidden, encoder_mask,
        method=VB.t5_score_classes,
    )  # (B, C, L, vocab)
    b = logits.shape[0]
    c, l = class_input_ids.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(
        logp, jnp.broadcast_to(class_input_ids[None, :, :, None], (b, c, l, 1)), axis=-1
    )[..., 0]
    token_ll = token_ll * class_attention_mask[None].astype(jnp.float32)
    lengths = jnp.maximum(class_attention_mask.sum(axis=-1)[None], 1)
    return token_ll.sum(axis=-1) / lengths


@functools.partial(jax.jit, static_argnames=("model",))
def _prefill_prompt(
    model: VB, variables, input_ids, attention_mask, pixel_values, video_input_mask,
    video_features=None,
):
    inputs_embeds = model.apply(
        variables, input_ids, pixel_values, video_input_mask,
        method=VB.embed_and_scatter, video_features=video_features,
    )
    b, s, _ = inputs_embeds.shape
    cache = opt_mod.init_cache(model.config.text_config, b, s, dtype=inputs_embeds.dtype)
    logits, cache = model.apply(
        variables, inputs_embeds, attention_mask=attention_mask, cache=cache, method=VB.lm_forward
    )
    return logits[:, -1], cache


@functools.partial(jax.jit, static_argnames=("model",))
def _score_classes(model: VB, variables, class_input_ids, class_attention_mask, last_logits, cache):
    """class_input_ids: (C, L). Returns (B, C) mean log-likelihood."""
    b = last_logits.shape[0]
    c, l = class_input_ids.shape
    class_embeds = model.apply(variables, class_input_ids, method=VB.lm_embed)  # (C, L, D)
    class_embeds = jnp.broadcast_to(class_embeds[None], (b, c, l, class_embeds.shape[-1]))
    cls_mask = jnp.broadcast_to(class_attention_mask[None], (b, c, l))
    logits = model.apply(variables, class_embeds, cls_mask, cache, method=VB.lm_score_with_prefix)

    # shift: token 0 is predicted by the prompt's last logits, token t by class
    # logits t-1 (reference v2.py:468-476)
    shift_logits = jnp.concatenate(
        [jnp.broadcast_to(last_logits[:, None, None], (b, c, 1, logits.shape[-1])), logits[:, :, :-1]],
        axis=2,
    )
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(
        logp, jnp.broadcast_to(class_input_ids[None, :, :, None], (b, c, l, 1)), axis=-1
    )[..., 0]
    token_ll = token_ll * class_attention_mask[None].astype(jnp.float32)
    lengths = jnp.maximum(class_attention_mask.sum(axis=-1)[None], 1)
    return token_ll.sum(axis=-1) / lengths  # (B, C)


def classify(
    model: VB,
    variables,
    *,
    prompt_input_ids: jax.Array,
    class_input_ids: jax.Array,
    prompt_attention_mask: Optional[jax.Array] = None,
    pixel_values: Optional[jax.Array] = None,
    prompt_video_input_mask: Optional[jax.Array] = None,
    class_attention_mask: Optional[jax.Array] = None,
    class_batch_size: Optional[int] = None,
    video_features: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean log-likelihood of each class continuation given the prompt.

    Args mirror reference ``classify`` (v2.py:326-350); prompts must be
    LEFT-padded (v2.py:339-340). Returns (batch, num_classes) float32.

    ``video_features`` (precomputed ``encode_videos`` output, flattened
    (num_videos * num_query_tokens, text_hidden)) skips the vision tower —
    the icl_eval workload calls classify twice per datapoint (verb, then noun
    — reference icl_eval.py:239-313) on the SAME videos, so encoding once and
    passing features here halves the vision work even without cross-datapoint
    reuse (serving.VideoFeatureCache adds that).
    """
    if prompt_attention_mask is None:
        prompt_attention_mask = jnp.ones_like(prompt_input_ids)
    if class_attention_mask is None:
        class_attention_mask = jnp.ones_like(class_input_ids)

    num_classes = class_input_ids.shape[0]

    if not model.config.use_decoder_only_language_model:
        # seq2seq: one encoder pass, classes attend the shared encoder states
        encoder_hidden = _encode_prompt_seq2seq(
            model, variables, prompt_input_ids, prompt_attention_mask,
            None if video_features is not None else pixel_values,
            prompt_video_input_mask, video_features,
        )
        step = class_batch_size or num_classes
        chunks = [
            _score_classes_seq2seq(
                model, variables,
                class_input_ids[i : i + step],
                class_attention_mask[i : i + step],
                encoder_hidden, prompt_attention_mask,
            )
            for i in range(0, num_classes, step)
        ]
        return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)

    last_logits, cache = _prefill_prompt(
        model, variables, prompt_input_ids, prompt_attention_mask,
        None if video_features is not None else pixel_values,
        prompt_video_input_mask, video_features,
    )

    if class_batch_size is None or class_batch_size >= num_classes:
        return _score_classes(
            model, variables, class_input_ids, class_attention_mask, last_logits, cache
        )
    chunks = []
    for i in range(0, num_classes, class_batch_size):
        chunks.append(
            _score_classes(
                model,
                variables,
                class_input_ids[i : i + class_batch_size],
                class_attention_mask[i : i + class_batch_size],
                last_logits,
                cache,
            )
        )
    return jnp.concatenate(chunks, axis=1)
