"""Autoregressive decoding loops.

Parity target: the HF generation entry points the reference drives through
``VideoBlipForConditionalGeneration.generate`` (/root/reference/eilev/model/v2.py:254-324):
greedy, temperature/top-k/top-p sampling, and beam search (the flagship sample
uses beam 5 with ``length_penalty=-1`` - reference
``samples/eilev_generate_action_narration.py:60-75``).

TPU-native structure:
  - greedy/sampling run as one ``lax.scan`` over a preallocated fixed-shape KV
    cache - a single compiled program, zero host round-trips per token;
  - beam search keeps the per-token model step compiled (prefill + decode step +
    cache reorder all jitted) while the HF ``BeamSearchScorer`` bookkeeping
    (hypothesis sets, early-stopping heuristics) runs host-side in numpy, which
    reproduces HF semantics exactly without dynamic shapes on device.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import OPTConfig, VideoBlipConfig
from ..models import opt as opt_mod
from ..models.video_blip import VideoBlipForConditionalGeneration as VB
from .config import GenerationConfig


# ---------------------------------------------------------------------------
# token selection
# ---------------------------------------------------------------------------


def _filter_top_k(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, jnp.finfo(logits.dtype).min, logits)


def _filter_top_p(logits: jax.Array, p: float) -> jax.Array:
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds p (always keep the top token)
    keep_sorted = (cum - probs) < p
    kth = jnp.where(
        keep_sorted, sorted_logits, jnp.full_like(sorted_logits, jnp.finfo(logits.dtype).max)
    )
    threshold = jnp.min(kth, axis=-1, keepdims=True)
    return jnp.where(logits < threshold, jnp.finfo(logits.dtype).min, logits)


def _select_token(logits: jax.Array, cfg: GenerationConfig, rng: Optional[jax.Array]) -> jax.Array:
    if not cfg.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = logits / jnp.maximum(cfg.temperature, 1e-6)
    x = _filter_top_k(x, cfg.top_k)
    x = _filter_top_p(x, cfg.top_p)
    return jax.random.categorical(rng, x, axis=-1).astype(jnp.int32)


def _is_eos(tokens: jax.Array, cfg: GenerationConfig) -> jax.Array:
    if not cfg.eos_token_id:
        return jnp.zeros_like(tokens, dtype=bool)
    hit = jnp.zeros_like(tokens, dtype=bool)
    for e in cfg.eos_token_id:
        hit = hit | (tokens == e)
    return hit


# ---------------------------------------------------------------------------
# decoder-only (OPT) generation
# ---------------------------------------------------------------------------


def _prefill(model: VB, variables, inputs_embeds, attention_mask, max_new_tokens):
    b, s, _ = inputs_embeds.shape
    tcfg: OPTConfig = model.config.text_config
    cache = opt_mod.init_cache(tcfg, b, s + max_new_tokens, dtype=inputs_embeds.dtype)
    logits, cache = model.apply(
        variables, inputs_embeds, attention_mask=attention_mask, cache=cache, method=VB.lm_forward
    )
    return logits[:, -1], cache


@functools.partial(jax.jit, static_argnames=("model", "gen_cfg"))
def _greedy_sample_decoder_only(
    model: VB,
    variables,
    inputs_embeds: jax.Array,
    attention_mask: jax.Array,
    gen_cfg: GenerationConfig,
    rng: jax.Array,
) -> jax.Array:
    """Single compiled program: prefill + while_loop decode with EARLY EXIT when
    every sequence has emitted eos (HF semantics; the reference's narration
    workload budgets max_new_tokens=512 but generates ~10 tokens, so exiting at
    the actual length is a ~50x step saving - generate_narration_texts.py:203).

    Returns generated tokens (B, max_new_tokens); positions after eos hold pad.
    """
    b = inputs_embeds.shape[0]
    max_new = gen_cfg.max_new_tokens
    last_logits, cache = _prefill(model, variables, inputs_embeds, attention_mask, max_new)
    out_buf = jnp.full((b, max_new), gen_cfg.pad_token_id, jnp.int32)

    def cond(carry):
        step, _, _, finished, _, _ = carry
        return jnp.logical_and(step < max_new, ~jnp.all(finished))

    def body(carry):
        step, cache, logits, finished, out, cur_rng = carry
        cur_rng, step_rng = jax.random.split(cur_rng)
        tok = _select_token(logits, gen_cfg, step_rng)
        tok = jnp.where(finished, gen_cfg.pad_token_id, tok)
        new_finished = finished | _is_eos(tok, gen_cfg)
        out = jax.lax.dynamic_update_slice(out, tok[:, None], (0, step))
        embeds = model.apply(variables, tok[:, None], method=VB.lm_embed)
        next_logits, cache = model.apply(
            variables,
            embeds,
            attention_mask=jnp.ones((b, 1), jnp.int32),
            cache=cache,
            method=VB.lm_forward,
        )
        return (step + 1, cache, next_logits[:, -1], new_finished, out, cur_rng)

    carry = (jnp.zeros((), jnp.int32), cache, last_logits, jnp.zeros((b,), bool), out_buf, rng)
    _, _, _, _, out, _ = jax.lax.while_loop(cond, body, carry)
    return out


# ---------------------------------------------------------------------------
# beam search (HF BeamSearchScorer semantics; device step + host bookkeeping)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("model",))
def _beam_step(model: VB, variables, tokens: jax.Array, cache) -> tuple[jax.Array, Any]:
    embeds = model.apply(variables, tokens[:, None], method=VB.lm_embed)
    logits, cache = model.apply(
        variables,
        embeds,
        attention_mask=jnp.ones((tokens.shape[0], 1), jnp.int32),
        cache=cache,
        method=VB.lm_forward,
    )
    return jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1), cache


@functools.partial(jax.jit, static_argnames=("model",))
def _reorder_cache(model: VB, cache, beam_idx: jax.Array):
    del model
    out = dict(cache)
    for key in ("k", "v"):
        out[key] = jnp.take(cache[key], beam_idx, axis=1)
    out["mask"] = jnp.take(cache["mask"], beam_idx, axis=0)
    out["pos"] = jnp.take(cache["pos"], beam_idx, axis=0)
    return out


class _BeamHypotheses:
    """HF ``BeamHypotheses``: keeps the num_beams best finished hypotheses with
    length-penalized scores."""

    def __init__(self, num_beams: int, length_penalty: float, early_stopping: bool):
        self.num_beams = num_beams
        self.length_penalty = length_penalty
        self.early_stopping = early_stopping
        self.beams: list[tuple[float, np.ndarray]] = []
        self.worst_score = 1e9

    def add(self, hyp: np.ndarray, sum_logprobs: float) -> None:
        score = sum_logprobs / max(len(hyp), 1) ** self.length_penalty
        if len(self.beams) < self.num_beams or score > self.worst_score:
            self.beams.append((score, hyp))
            if len(self.beams) > self.num_beams:
                idx = int(np.argmin([s for s, _ in self.beams]))
                del self.beams[idx]
            self.worst_score = min(s for s, _ in self.beams)

    def is_done(self, best_sum_logprobs: float, cur_len: int) -> bool:
        if len(self.beams) < self.num_beams:
            return False
        if self.early_stopping:
            return True
        # HF early_stopping=False heuristic
        highest_attainable = best_sum_logprobs / cur_len**self.length_penalty
        return self.worst_score >= highest_attainable


def _beam_search_decoder_only(
    model: VB,
    variables,
    inputs_embeds: jax.Array,
    attention_mask: jax.Array,
    gen_cfg: GenerationConfig,
) -> jax.Array:
    b, s, d = inputs_embeds.shape
    nb = gen_cfg.num_beams
    eos = gen_cfg.eos_token_id or ()
    pad = gen_cfg.pad_token_id

    # expand to (B * nb)
    embeds = jnp.repeat(inputs_embeds, nb, axis=0)
    mask = jnp.repeat(attention_mask, nb, axis=0)
    last_logits, cache = _prefill(model, variables, embeds, mask, gen_cfg.max_new_tokens)
    logprobs = np.asarray(jax.nn.log_softmax(last_logits.astype(jnp.float32), axis=-1))

    beam_scores = np.full((b, nb), -1e9, np.float32)
    beam_scores[:, 0] = 0.0
    hyps = [_BeamHypotheses(nb, gen_cfg.length_penalty, gen_cfg.early_stopping) for _ in range(b)]
    done = [False] * b
    generated = np.zeros((b * nb, 0), np.int64)

    for cur_len in range(1, gen_cfg.max_new_tokens + 1):
        vocab = logprobs.shape[-1]
        next_scores = logprobs.reshape(b, nb, vocab) + beam_scores[:, :, None]
        flat = next_scores.reshape(b, nb * vocab)
        top_idx = np.argsort(-flat, axis=1, kind="stable")[:, : 2 * nb]
        top_scores = np.take_along_axis(flat, top_idx, axis=1)
        top_tokens = top_idx % vocab
        top_beams = top_idx // vocab

        next_beam_scores = np.zeros((b, nb), np.float32)
        next_beam_tokens = np.zeros((b, nb), np.int64)
        next_beam_indices = np.zeros((b, nb), np.int64)

        for bi in range(b):
            if done[bi]:
                next_beam_scores[bi] = 0.0
                next_beam_tokens[bi] = pad
                next_beam_indices[bi] = bi * nb  # arbitrary live index
                continue
            slot = 0
            for rank in range(2 * nb):
                token = int(top_tokens[bi, rank])
                score = float(top_scores[bi, rank])
                src = bi * nb + int(top_beams[bi, rank])
                if token in eos:
                    if rank >= nb:
                        continue
                    hyps[bi].add(np.append(generated[src], token), score)
                else:
                    next_beam_scores[bi, slot] = score
                    next_beam_tokens[bi, slot] = token
                    next_beam_indices[bi, slot] = src
                    slot += 1
                if slot == nb:
                    break
            done[bi] = done[bi] or hyps[bi].is_done(float(top_scores[bi, 0]), cur_len)

        beam_scores = next_beam_scores
        reorder = next_beam_indices.reshape(-1)
        generated = np.concatenate(
            [generated[reorder], next_beam_tokens.reshape(-1, 1)], axis=1
        )
        if all(done) or cur_len == gen_cfg.max_new_tokens:
            break
        cache = _reorder_cache(model, cache, jnp.asarray(reorder))
        logprobs_dev, cache = _beam_step(model, variables, jnp.asarray(next_beam_tokens.reshape(-1)), cache)
        logprobs = np.asarray(logprobs_dev)

    # finalize: add still-running beams (HF adds all open beams when not done)
    for bi in range(b):
        if done[bi]:
            continue
        for beam in range(nb):
            idx = bi * nb + beam
            hyps[bi].add(generated[idx], float(beam_scores[bi, beam]))

    # best hypothesis per batch, right-padded with pad token
    best = [max(h.beams, key=lambda x: x[0])[1] for h in hyps]
    max_len = max(len(h) for h in best)
    out = np.full((b, max_len), pad, np.int64)
    for bi, h in enumerate(best):
        out[bi, : len(h)] = h
    return jnp.asarray(out)


# ---------------------------------------------------------------------------
# T5 (encoder-decoder) generation
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("model",))
def _t5_beam_step(model: VB, variables, tokens, encoder_hidden, encoder_mask, cache):
    logits, cache = model.apply(
        variables, tokens[:, None], encoder_hidden, encoder_mask, cache, method=VB.t5_decode_step
    )
    return jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1), cache


@functools.partial(jax.jit, static_argnames=("model",))
def _t5_reorder_cache(model: VB, cache, beam_idx: jax.Array):
    del model
    out = dict(cache)
    for key in ("k", "v", "cross_k", "cross_v"):
        out[key] = jnp.take(cache[key], beam_idx, axis=1)
    return out


def _beam_search_seq2seq(
    model: VB,
    variables,
    inputs_embeds: jax.Array,
    attention_mask: jax.Array,
    gen_cfg: GenerationConfig,
) -> jax.Array:
    """HF-semantics beam search for the T5 family (same device-step/host-
    bookkeeping split as the decoder-only path)."""
    tcfg = model.config.text_config
    b = inputs_embeds.shape[0]
    nb = gen_cfg.num_beams
    eos = gen_cfg.eos_token_id or ()
    pad = gen_cfg.pad_token_id

    encoder_hidden = model.apply(variables, inputs_embeds, attention_mask, method=VB.t5_encode)
    encoder_hidden = jnp.repeat(encoder_hidden, nb, axis=0)
    enc_mask = jnp.repeat(attention_mask, nb, axis=0)
    cache = model.apply(
        variables,
        encoder_hidden,
        gen_cfg.max_new_tokens + 1,
        method=lambda mdl, h, n: mdl.language_model.init_decode_cache(h, n),
    )
    start = jnp.full((b * nb,), tcfg.decoder_start_token_id, jnp.int32)
    logprobs_dev, cache = _t5_beam_step(model, variables, start, encoder_hidden, enc_mask, cache)
    logprobs = np.asarray(logprobs_dev)

    beam_scores = np.full((b, nb), -1e9, np.float32)
    beam_scores[:, 0] = 0.0
    hyps = [_BeamHypotheses(nb, gen_cfg.length_penalty, gen_cfg.early_stopping) for _ in range(b)]
    done = [False] * b
    generated = np.zeros((b * nb, 0), np.int64)

    for cur_len in range(1, gen_cfg.max_new_tokens + 1):
        vocab = logprobs.shape[-1]
        flat = (logprobs.reshape(b, nb, vocab) + beam_scores[:, :, None]).reshape(b, nb * vocab)
        top_idx = np.argsort(-flat, axis=1, kind="stable")[:, : 2 * nb]
        top_scores = np.take_along_axis(flat, top_idx, axis=1)
        top_tokens = top_idx % vocab
        top_beams = top_idx // vocab

        next_scores = np.zeros((b, nb), np.float32)
        next_tokens = np.zeros((b, nb), np.int64)
        next_indices = np.zeros((b, nb), np.int64)
        for bi in range(b):
            if done[bi]:
                next_scores[bi] = 0.0
                next_tokens[bi] = pad
                next_indices[bi] = bi * nb
                continue
            slot = 0
            for rank in range(2 * nb):
                token = int(top_tokens[bi, rank])
                score = float(top_scores[bi, rank])
                src = bi * nb + int(top_beams[bi, rank])
                if token in eos:
                    if rank >= nb:
                        continue
                    hyps[bi].add(np.append(generated[src], token), score)
                else:
                    next_scores[bi, slot] = score
                    next_tokens[bi, slot] = token
                    next_indices[bi, slot] = src
                    slot += 1
                if slot == nb:
                    break
            done[bi] = done[bi] or hyps[bi].is_done(float(top_scores[bi, 0]), cur_len)

        beam_scores = next_scores
        reorder = next_indices.reshape(-1)
        generated = np.concatenate([generated[reorder], next_tokens.reshape(-1, 1)], axis=1)
        if all(done) or cur_len == gen_cfg.max_new_tokens:
            break
        cache = _t5_reorder_cache(model, cache, jnp.asarray(reorder))
        logprobs_dev, cache = _t5_beam_step(
            model, variables, jnp.asarray(next_tokens.reshape(-1), jnp.int32),
            encoder_hidden, enc_mask, cache,
        )
        logprobs = np.asarray(logprobs_dev)

    for bi in range(b):
        if done[bi]:
            continue
        for beam in range(nb):
            hyps[bi].add(generated[bi * nb + beam], float(beam_scores[bi, beam]))
    best = [max(h.beams, key=lambda x: x[0])[1] for h in hyps]
    max_len = max(len(h) for h in best)
    out = np.full((b, max_len + 1), pad, np.int64)
    out[:, 0] = tcfg.decoder_start_token_id
    for bi, h in enumerate(best):
        out[bi, 1 : 1 + len(h)] = h
    return jnp.asarray(out)


@functools.partial(jax.jit, static_argnames=("model", "gen_cfg"))
def _greedy_sample_seq2seq(
    model: VB,
    variables,
    inputs_embeds: jax.Array,
    attention_mask: jax.Array,
    gen_cfg: GenerationConfig,
    rng: jax.Array,
) -> jax.Array:
    tcfg = model.config.text_config
    b = inputs_embeds.shape[0]
    encoder_hidden = model.apply(variables, inputs_embeds, attention_mask, method=VB.t5_encode)
    cache = model.apply(
        variables,
        encoder_hidden,
        gen_cfg.max_new_tokens + 1,
        method=lambda mdl, h, n: mdl.language_model.init_decode_cache(h, n),
    )
    start = jnp.full((b, 1), tcfg.decoder_start_token_id, jnp.int32)
    logits, cache = model.apply(
        variables, start, encoder_hidden, attention_mask, cache, method=VB.t5_decode_step
    )
    max_new = gen_cfg.max_new_tokens
    out_buf = jnp.full((b, max_new), gen_cfg.pad_token_id, jnp.int32)

    def cond(carry):
        step, _, _, finished, _, _ = carry
        return jnp.logical_and(step < max_new, ~jnp.all(finished))

    def body(carry):
        step, cache, logits, finished, out, cur_rng = carry
        cur_rng, step_rng = jax.random.split(cur_rng)
        tok = _select_token(logits[:, -1], gen_cfg, step_rng)
        tok = jnp.where(finished, gen_cfg.pad_token_id, tok)
        new_finished = finished | _is_eos(tok, gen_cfg)
        out = jax.lax.dynamic_update_slice(out, tok[:, None], (0, step))
        next_logits, cache = model.apply(
            variables, tok[:, None], encoder_hidden, attention_mask, cache, method=VB.t5_decode_step
        )
        return (step + 1, cache, next_logits, new_finished, out, cur_rng)

    carry = (jnp.zeros((), jnp.int32), cache, logits, jnp.zeros((b,), bool), out_buf, rng)
    _, _, _, _, out, _ = jax.lax.while_loop(cond, body, carry)
    # HF sequences start with decoder_start_token_id
    return jnp.concatenate([start, out], axis=1)


# ---------------------------------------------------------------------------
# public entry point
# ---------------------------------------------------------------------------


def generate(
    model: VB,
    variables,
    *,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    pixel_values: Optional[jax.Array] = None,
    video_input_mask: Optional[jax.Array] = None,
    generation_config: GenerationConfig = GenerationConfig(),
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Drop-in equivalent of reference ``VideoBlipForConditionalGeneration.generate``
    (v2.py:254-324): encode videos, scatter into the prompt embeddings, decode.

    Returns (B, <=max_new_tokens) generated token ids (decoder-only LMs: new tokens
    only; seq2seq: includes the decoder start token, like HF).
    """
    cfg: VideoBlipConfig = model.config
    gen_cfg = generation_config
    if gen_cfg.eos_token_id is None:
        eos = (
            cfg.text_config.eos_token_id
            if isinstance(cfg.text_config, OPTConfig)
            else cfg.text_config.eos_token_id
        )
        gen_cfg = gen_cfg.with_eos(eos)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)

    inputs_embeds = model.apply(
        variables, input_ids, pixel_values, video_input_mask, method=type(model).embed_and_scatter
    )
    if inputs_embeds.shape[1] != attention_mask.shape[1]:
        # v1 prepends video features; extend the mask with ones on the left
        # (reference-era Blip2ForConditionalGeneration.generate behavior)
        prefix = jnp.ones(
            (attention_mask.shape[0], inputs_embeds.shape[1] - attention_mask.shape[1]),
            attention_mask.dtype,
        )
        attention_mask = jnp.concatenate([prefix, attention_mask], axis=1)

    if isinstance(cfg.text_config, OPTConfig):
        if gen_cfg.num_beams > 1:
            return _beam_search_decoder_only(model, variables, inputs_embeds, attention_mask, gen_cfg)
        return _greedy_sample_decoder_only(
            model, variables, inputs_embeds, attention_mask, gen_cfg, rng
        )
    if gen_cfg.num_beams > 1:
        return _beam_search_seq2seq(model, variables, inputs_embeds, attention_mask, gen_cfg)
    return _greedy_sample_seq2seq(model, variables, inputs_embeds, attention_mask, gen_cfg, rng)
