"""Speculative decoding for the narration workload (decoder-only LMs).

The decode loop is weight-stream-bound (~10 ms/step ≈ the HBM floor at the
flagship shape — benchmarks/decode_structure.py), so the one step-count lever
left is verifying several tokens per weight pass. This implements greedy
speculative decoding: a cheap DRAFT proposes ``gamma`` tokens, the target
verifies all of them in ONE multi-token forward (same weight stream as a
single step), and the longest agreeing prefix plus the target's correction
token are emitted. Output is TOKEN-IDENTICAL to plain greedy decoding by
construction — verification recomputes the target's own argmax at every
position (tested in tests/generation/test_speculative.py).

Draft: any decoder-only LM sharing the target's embedding space. The built-in
choice is SELF-drafting with the first ``draft_layers`` of the target
(:func:`make_self_draft`) — zero extra weights to load, and the truncated
stack shares the full model's embeddings/head, the standard early-exit draft.

Batched semantics: the per-iteration global advance is the MINIMUM accepted
length over unfinished rows (the cache keeps one scalar fill index). Rows
that accepted more simply re-derive those tokens next iteration — greedy is
deterministic, so the output is unchanged; only the speedup shrinks with
batch. The reference's own 16-shot generation protocol runs batch 1 per
device (/root/reference/slurm-scripts/README.md:71-76), where min == the
row's own acceptance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..configs import OPTConfig
from ..models import opt as opt_mod
from ..models.opt import OPTForCausalLM
from .config import GenerationConfig


def make_self_draft(text_config, lm_params: dict, num_layers: int, dtype):
    """Truncated-stack draft: the target's first ``num_layers`` decoder layers
    plus everything around the stack (embeddings, final norm, head), as a
    standalone decoder of the same family (OPT or LLaMA — any config with
    ``num_hidden_layers`` whose flax tree names layers ``layers_i``)."""
    import dataclasses

    cfg = dataclasses.replace(text_config, num_hidden_layers=num_layers)
    params = {
        k: v
        for k, v in lm_params.items()
        if not k.startswith("layers_") or int(k.split("_")[1]) < num_layers
    }
    if isinstance(text_config, OPTConfig):
        return OPTForCausalLM(cfg, dtype=dtype), params
    from ..models.llama import LlamaForCausalLM

    return LlamaForCausalLM(cfg, dtype=dtype), params


@functools.partial(
    jax.jit, static_argnames=("model", "draft_model", "gen_cfg", "gamma")
)
def speculative_greedy_decode(
    model: OPTForCausalLM,
    lm_params: dict,
    draft_model: OPTForCausalLM,
    draft_params: dict,
    inputs_embeds: jax.Array,
    attention_mask: jax.Array,
    gen_cfg: GenerationConfig,
    gamma: int = 4,
) -> jax.Array:
    """Token-identical greedy decode with draft-and-verify batching.

    Returns (B, max_new_tokens) generated ids, pad-filled after eos — the
    same contract as decoding._greedy_sample_decoder_only.
    """
    assert not gen_cfg.do_sample, "speculative path implements greedy only"
    b, s, _ = inputs_embeds.shape
    max_new = gen_cfg.max_new_tokens
    pad = gen_cfg.pad_token_id
    eos = tuple(gen_cfg.eos_token_id or ())
    cache_len = s + max_new + gamma + 2

    def eos_hit(t):
        hit = jnp.zeros(t.shape, bool)
        for e in eos:
            hit = hit | (t == e)
        return hit

    t_cache = opt_mod.init_cache(model.config, b, cache_len, dtype=inputs_embeds.dtype)
    d_cache = opt_mod.init_cache(
        draft_model.config, b, cache_len, dtype=inputs_embeds.dtype
    )
    t_logits, t_cache = model.apply(
        {"params": lm_params}, inputs_embeds, attention_mask=attention_mask,
        cache=t_cache,
    )
    d_logits, d_cache = draft_model.apply(
        {"params": draft_params}, inputs_embeds, attention_mask=attention_mask,
        cache=d_cache,
    )
    del d_logits  # the draft re-derives its continuation from `pending`
    # the target's next token is known from the prefill logits
    pending = jnp.argmax(t_logits[:, -1], -1).astype(jnp.int32)

    out0 = jnp.full((b, max_new + gamma + 2), pad, jnp.int32)
    finished0 = jnp.zeros((b,), bool)
    # emit `pending` as token 0
    pending = jnp.where(finished0, pad, pending)
    fin0 = finished0 | eos_hit(pending)
    out0 = out0.at[:, 0].set(pending)

    def embed(mdl, params, tok):
        return mdl.apply({"params": params}, tok, method=type(mdl).embed)

    def cond(carry):
        n_emitted, _, _, _, finished, _ = carry
        return jnp.logical_and(n_emitted < max_new, ~jnp.all(finished))

    def body(carry):
        n_emitted, t_cache, d_cache, pending, finished, out = carry

        # ---- draft gamma tokens (gamma+1 single-token draft steps, so the
        # draft cache ends up valid through the whole block) ----
        def dstep(c, _):
            d_cache, tok = c
            logits, d_cache = draft_model.apply(
                {"params": draft_params},
                embed(draft_model, draft_params, tok[:, None]),
                attention_mask=jnp.ones((b, 1), jnp.int32),
                cache=d_cache,
            )
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            return (d_cache, nxt), nxt

        (d_cache, _), drafts = jax.lax.scan(
            dstep, (d_cache, pending), None, length=gamma + 1
        )
        drafts = drafts[:gamma].T  # (B, gamma); the gamma+1-th is cache-fill only

        # ---- verify: one target pass over [pending, d_1..d_gamma] ----
        block = jnp.concatenate([pending[:, None], drafts], axis=1)  # (B, gamma+1)
        v_logits, t_cache = model.apply(
            {"params": lm_params},
            embed(model, lm_params, block),
            attention_mask=jnp.ones((b, gamma + 1), jnp.int32),
            cache=t_cache,
            cache_append=True,
        )
        targets = jnp.argmax(v_logits, -1).astype(jnp.int32)  # (B, gamma+1)
        # y_i (i in 1..gamma+1) = target token after consuming block[:i]
        agree = drafts == targets[:, :gamma]  # d_i vs y_i
        a_row = jnp.sum(jnp.cumprod(agree.astype(jnp.int32), axis=1), axis=1)  # (B,)
        amin = jnp.min(jnp.where(finished, gamma, a_row))

        # ---- emissions: d_1..d_amin then y_{amin+1} (uniform across rows:
        # rows with a_row > amin have d_{amin+1} == y_{amin+1}) ----
        correction = jax.lax.dynamic_index_in_dim(targets, amin, 1, keepdims=False)
        col = jax.lax.broadcasted_iota(jnp.int32, (b, gamma + 1), 1)
        emit0 = jnp.concatenate(
            [drafts, jnp.full((b, 1), pad, jnp.int32)], axis=1
        )  # (B, gamma+1)
        emit = jnp.where(
            col < amin, emit0, jnp.where(col == amin, correction[:, None], pad)
        )
        # per-row eos/finished: pad everything after the first eos
        emit = jnp.where(finished[:, None], pad, emit)
        hits = eos_hit(emit) & (col <= amin)
        first_eos = jnp.min(jnp.where(hits, col, gamma + 1), axis=1)
        emit = jnp.where(col > first_eos[:, None], pad, emit)
        new_finished = finished | (first_eos <= gamma)

        out = jax.lax.dynamic_update_slice(out, emit, (0, n_emitted))

        # ---- roll both caches back to the accepted prefix ----
        t_new_index = t_cache["index"] - (gamma + 1) + (amin + 1)
        d_new_index = d_cache["index"] - (gamma + 1) + (amin + 1)

        def trim(cache, new_index):
            cache = dict(cache)
            max_len = cache["mask"].shape[1]
            slot = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
            cache["mask"] = jnp.where(slot < new_index, cache["mask"], 0)
            cache["pos"] = cache["pos"] - (cache["index"] - new_index)
            cache["index"] = new_index
            return cache

        t_cache = trim(t_cache, t_new_index)
        d_cache = trim(d_cache, d_new_index)

        new_pending = jnp.where(new_finished, pad, correction)
        return (
            n_emitted + amin + 1,
            t_cache,
            d_cache,
            new_pending,
            new_finished,
            out,
        )

    carry = (jnp.ones((), jnp.int32), t_cache, d_cache, pending, fin0, out0)
    _, _, _, _, _, out = jax.lax.while_loop(cond, body, carry)
    return out[:, :max_new]


# ---------------------------------------------------------------------------
# prompt-lookup drafting (model-free)
# ---------------------------------------------------------------------------


def lookup_drafts_rows(
    corpus: jax.Array,
    end: jax.Array,
    gamma: int,
    match_len: int,
    pad: int,
    vocab: Optional[int] = None,
) -> jax.Array:
    """(B, gamma) proposed continuations of each row's emitted tail.

    ``corpus``: (B, CL) int32, invalid positions -1 (see
    :func:`build_lookup_corpus`); ``end``: (B,) int32 — each row's first
    invalid position (prompt + emitted-so-far length). HF prompt-lookup
    semantics, vectorized per row: descending n-gram size from ``match_len``,
    first size with a match wins, FIRST occurrence at that size (first — not
    most-recent — because greedy text contains token runs, and the most
    recent occurrence of a run token sits at the run's END while the current
    position may be at its start; measured 2.0 -> 8.0 tokens/pass on the echo
    corpus, benchmarks/prompt_lookup_bench.py). Rows with no match (or
    masked -1 positions inside the gathered window) propose ``pad``, which a
    verify pass only ever accepts if the target truly emits pad.

    Shared by the static decode path (:func:`prompt_lookup_greedy_decode`,
    uniform ``end`` across rows) and the continuous-batching engine
    (serving/engine.py, per-slot ``end``).
    """
    b, cl = corpus.shape
    found = jnp.zeros((b,), bool)
    start = jnp.zeros((b,), jnp.int32)
    for k in range(match_len, 0, -1):
        tail = jax.vmap(
            lambda row, e: jax.lax.dynamic_slice(row, (e - k,), (k,))
        )(corpus, end)  # (B, k) — the last k valid tokens of each row
        nwin = cl - k
        match = jnp.ones((b, nwin), bool)
        for j in range(k):
            match = match & (corpus[:, j : j + nwin] == tail[:, j : j + 1])
        widx = jax.lax.broadcasted_iota(jnp.int32, (b, nwin), 1)
        # window [i, i+k) must sit fully inside the valid region AND have at
        # least one valid continuation token (i + k < end); this also excludes
        # the trivial self-match of the tail with itself
        ok = match & (widx + k < end[:, None])
        has_k = jnp.any(ok, axis=1)
        best_k = jnp.min(jnp.where(ok, widx, cl), axis=1)  # first occurrence
        take = has_k & ~found
        start = jnp.where(take, best_k + k, start)
        found = found | has_k
    drafts = jax.vmap(
        lambda row, st: jax.lax.dynamic_slice_in_dim(row, st, gamma)
    )(corpus, start)
    ok = found[:, None] & (drafts >= 0)
    if vocab is not None:
        # a wider caller-provided corpus may contain out-of-vocab ids; an
        # out-of-vocab token in the verify block embeds to NaN, and NaN k/v
        # poison the softmax of EVERY query past the causal bias (-inf + NaN
        # = NaN) — so invalid proposals must never reach the verifier
        ok = ok & (drafts < vocab)
    return jnp.where(ok, drafts, pad)


def build_lookup_corpus(
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    video_input_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Prompt-side lookup corpus: input ids with padding and video-feature
    placeholder positions masked to -1 (never equal to a real token, so no
    spurious n-gram matches against the num_query_tokens pad runs the
    interleaved prompt builder emits per video - reference
    ``eilev/data/utils.py:173-178``)."""
    corpus = jnp.asarray(input_ids, jnp.int32)
    keep = jnp.ones_like(corpus, dtype=bool)
    if attention_mask is not None:
        keep = keep & (jnp.asarray(attention_mask) > 0)
    if video_input_mask is not None:
        keep = keep & (jnp.asarray(video_input_mask) == 0)
    return jnp.where(keep, corpus, -1)


@functools.partial(
    jax.jit,
    static_argnames=("model", "gen_cfg", "gamma", "match_len", "return_stats"),
)
def prompt_lookup_greedy_decode(
    model: OPTForCausalLM,
    lm_params: dict,
    prompt_corpus: jax.Array,
    inputs_embeds: jax.Array,
    attention_mask: jax.Array,
    gen_cfg: GenerationConfig,
    gamma: int = 8,
    match_len: int = 3,
    return_stats: bool = False,
) -> jax.Array:
    """Token-identical greedy decode with MODEL-FREE prompt-lookup drafting.

    Instead of a draft model, each iteration proposes the ``gamma`` tokens
    that followed the most recent occurrence of the current n-gram tail
    (down to 1-gram) in [prompt corpus + generated so far] — near-zero draft
    cost, so the per-iteration cost is one multi-token verify pass (~the
    single-step weight stream). The 16-shot narration workload is maximally
    favorable: generated narrations echo the in-context example narrations
    (reference sampling by shared verb/noun, ``eilev/data/frame.py:179-266``),
    so matched continuations are long. Verification recomputes the target's
    own argmax at every position, so output == plain greedy regardless of
    draft quality (tests/generation/test_prompt_lookup.py).

    ``prompt_corpus``: (B, S) from :func:`build_lookup_corpus` (invalid
    positions -1). Same batched-min-advance semantics as
    :func:`speculative_greedy_decode`.

    ``return_stats=True`` additionally returns (tokens_emitted, verify_passes)
    scalars — tokens/pass is the realized speculative advance (1.0 = no
    acceptance, gamma+1 = full acceptance).
    """
    assert not gen_cfg.do_sample, "prompt-lookup path implements greedy only"
    b, s, _ = inputs_embeds.shape
    max_new = gen_cfg.max_new_tokens
    pad = gen_cfg.pad_token_id
    eos = tuple(gen_cfg.eos_token_id or ())
    out_len = max_new + gamma + 2
    cache_len = s + max_new + gamma + 2
    # the corpus may be WIDER than the prompt (callers can append extra
    # reference text, e.g. the vision-cache eval passes example narrations)
    p_len = prompt_corpus.shape[1]
    corpus_len = p_len + out_len

    def eos_hit(t):
        hit = jnp.zeros(t.shape, bool)
        for e in eos:
            hit = hit | (t == e)
        return hit

    t_cache = opt_mod.init_cache(model.config, b, cache_len, dtype=inputs_embeds.dtype)
    t_logits, t_cache = model.apply(
        {"params": lm_params}, inputs_embeds, attention_mask=attention_mask,
        cache=t_cache,
    )
    pending = jnp.argmax(t_logits[:, -1], -1).astype(jnp.int32)

    out0 = jnp.full((b, out_len), pad, jnp.int32)
    finished0 = jnp.zeros((b,), bool)
    pending = jnp.where(finished0, pad, pending)
    fin0 = finished0 | eos_hit(pending)
    out0 = out0.at[:, 0].set(pending)

    def embed(tok):
        return model.apply({"params": lm_params}, tok, method=type(model).embed)

    def lookup_drafts(out, n_emitted):
        """(B, gamma) proposed continuations of the emitted tail (shared
        matcher :func:`lookup_drafts_rows`; every row's end is the same here
        because the static path advances all rows in lockstep)."""
        corpus = jnp.concatenate([prompt_corpus, out], axis=1)  # (B, corpus_len)
        end = jnp.full((b,), p_len + n_emitted, jnp.int32)
        return lookup_drafts_rows(
            corpus, end, gamma, match_len, pad, vocab=model.config.vocab_size
        )

    def cond(carry):
        n_emitted, _, _, finished, _ = carry
        return jnp.logical_and(n_emitted < max_new, ~jnp.all(finished))

    def body(carry, iters):
        n_emitted, t_cache, pending, finished, out = carry
        drafts = lookup_drafts(out, n_emitted)  # (B, gamma)

        # ---- verify: one target pass over [pending, d_1..d_gamma] ----
        block = jnp.concatenate([pending[:, None], drafts], axis=1)
        v_logits, t_cache = model.apply(
            {"params": lm_params},
            embed(block),
            attention_mask=jnp.ones((b, gamma + 1), jnp.int32),
            cache=t_cache,
            cache_append=True,
        )
        targets = jnp.argmax(v_logits, -1).astype(jnp.int32)  # (B, gamma+1)
        agree = drafts == targets[:, :gamma]
        a_row = jnp.sum(jnp.cumprod(agree.astype(jnp.int32), axis=1), axis=1)
        amin = jnp.min(jnp.where(finished, gamma, a_row))

        # ---- emissions: d_1..d_amin then y_{amin+1} (see
        # speculative_greedy_decode for the uniform-across-rows argument) ----
        correction = jax.lax.dynamic_index_in_dim(targets, amin, 1, keepdims=False)
        col = jax.lax.broadcasted_iota(jnp.int32, (b, gamma + 1), 1)
        emit0 = jnp.concatenate([drafts, jnp.full((b, 1), pad, jnp.int32)], axis=1)
        emit = jnp.where(
            col < amin, emit0, jnp.where(col == amin, correction[:, None], pad)
        )
        emit = jnp.where(finished[:, None], pad, emit)
        hits = eos_hit(emit) & (col <= amin)
        first_eos = jnp.min(jnp.where(hits, col, gamma + 1), axis=1)
        emit = jnp.where(col > first_eos[:, None], pad, emit)
        new_finished = finished | (first_eos <= gamma)

        out = jax.lax.dynamic_update_slice(out, emit, (0, n_emitted))

        # ---- roll the target cache back to the accepted prefix ----
        new_index = t_cache["index"] - (gamma + 1) + (amin + 1)
        t_cache = dict(t_cache)
        max_len = t_cache["mask"].shape[1]
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
        t_cache["mask"] = jnp.where(slot < new_index, t_cache["mask"], 0)
        t_cache["pos"] = t_cache["pos"] - (t_cache["index"] - new_index)
        t_cache["index"] = new_index

        new_pending = jnp.where(new_finished, pad, correction)
        return (n_emitted + amin + 1, t_cache, new_pending, new_finished, out, iters + 1)

    def cond_w(carry):
        return cond(carry[:5])

    def body_w(carry):
        *inner, iters = carry
        return body(tuple(inner), iters)

    carry = (jnp.ones((), jnp.int32), t_cache, pending, fin0, out0, jnp.zeros((), jnp.int32))
    n_emitted, _, _, _, out, iters = jax.lax.while_loop(cond_w, body_w, carry)
    if return_stats:
        return out[:, :max_new], (jnp.minimum(n_emitted, max_new), iters)
    return out[:, :max_new]


# ---------------------------------------------------------------------------
# prompt-lookup speculative SAMPLING (distribution-preserving)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("model", "gen_cfg", "gamma", "match_len", "return_stats"),
)
def prompt_lookup_sample_decode(
    model: OPTForCausalLM,
    lm_params: dict,
    prompt_corpus: jax.Array,
    inputs_embeds: jax.Array,
    attention_mask: jax.Array,
    gen_cfg: GenerationConfig,
    rng: jax.Array,
    gamma: int = 8,
    match_len: int = 3,
    return_stats: bool = False,
) -> jax.Array:
    """DISTRIBUTION-PRESERVING sampling with prompt-lookup drafts.

    Speculative sampling (the rejection rule of Leviathan et al. / Chen et
    al., specialized to a deterministic draft): the lookup draft is a point
    mass q = delta(d_i), so position i's draft is accepted with probability
    p_i(d_i) (one uniform draw against the target's own warped probability of
    the drafted token), and the first rejected position resamples from the
    residual norm(max(0, p_i - q)) — which for a point-mass draft is exactly
    p_i with d_i zeroed and renormalized. Every emitted token is therefore an
    EXACT draw from the target's warped distribution (temperature -> top_k ->
    top_p, the same `_select_token` warp as the plain sampling loop), whatever
    the draft quality — only the speedup depends on the match rate. NOT
    bit-identical to the plain sampling loop (the rng is consumed in a
    different order); distribution-identical (statistically tested in
    tests/generation/test_prompt_lookup_sampling.py, and exactly equal to
    greedy prompt-lookup when the distribution is a point mass).

    Batched semantics: the global advance is the min acceptance over
    unfinished rows, as in the greedy path. Rows that accepted beyond the min
    simply discard those draws and redraw next iteration with FRESH uniforms
    (fold_in on the iteration counter) — discarded draws never influence an
    emitted token, so the output law is unchanged.

    Same contract as :func:`prompt_lookup_greedy_decode` plus ``rng``.
    """
    assert gen_cfg.do_sample, "use prompt_lookup_greedy_decode for greedy"
    from .decoding import _warp_logits

    b, s, _ = inputs_embeds.shape
    max_new = gen_cfg.max_new_tokens
    pad = gen_cfg.pad_token_id
    eos = tuple(gen_cfg.eos_token_id or ())
    out_len = max_new + gamma + 2
    cache_len = s + max_new + gamma + 2
    p_len = prompt_corpus.shape[1]

    def eos_hit(t):
        hit = jnp.zeros(t.shape, bool)
        for e in eos:
            hit = hit | (t == e)
        return hit

    def warp(logits):
        """The plain sampling loop's exact warp (decoding._select_token), in
        fp32: the full HF warper chain (temperature -> top_k -> top_p ->
        min_p -> typical_p -> epsilon -> eta), returned as logits."""
        return _warp_logits(logits.astype(jnp.float32), gen_cfg)

    t_cache = opt_mod.init_cache(model.config, b, cache_len, dtype=inputs_embeds.dtype)
    t_logits, t_cache = model.apply(
        {"params": lm_params}, inputs_embeds, attention_mask=attention_mask,
        cache=t_cache,
    )
    pending = jax.random.categorical(
        jax.random.fold_in(rng, 2**30), warp(t_logits[:, -1]), axis=-1
    ).astype(jnp.int32)

    out0 = jnp.full((b, out_len), pad, jnp.int32)
    finished0 = jnp.zeros((b,), bool)
    pending = jnp.where(finished0, pad, pending)
    fin0 = finished0 | eos_hit(pending)
    out0 = out0.at[:, 0].set(pending)

    def embed(tok):
        return model.apply({"params": lm_params}, tok, method=type(model).embed)

    def lookup_drafts(out, n_emitted):
        corpus = jnp.concatenate([prompt_corpus, out], axis=1)
        end = jnp.full((b,), p_len + n_emitted, jnp.int32)
        return lookup_drafts_rows(
            corpus, end, gamma, match_len, pad, vocab=model.config.vocab_size
        )

    def cond(carry):
        n_emitted, _, _, finished, _ = carry
        return jnp.logical_and(n_emitted < max_new, ~jnp.all(finished))

    def body(carry, iters):
        n_emitted, t_cache, pending, finished, out = carry
        drafts = lookup_drafts(out, n_emitted)  # (B, gamma)

        # ---- verify: one target pass over [pending, d_1..d_gamma] ----
        block = jnp.concatenate([pending[:, None], drafts], axis=1)
        v_logits, t_cache = model.apply(
            {"params": lm_params},
            embed(block),
            attention_mask=jnp.ones((b, gamma + 1), jnp.int32),
            cache=t_cache,
            cache_append=True,
        )
        x = warp(v_logits)  # (B, gamma+1, V) warped fp32 logits
        probs = jax.nn.softmax(x, axis=-1)

        it_rng = jax.random.fold_in(rng, iters)
        u_rng, res_rng = jax.random.split(it_rng)

        # ---- accept d_{i+1} with prob p_i(d_{i+1}) (point-mass draft) ----
        p_draft = jnp.take_along_axis(
            probs[:, :gamma], drafts[..., None], axis=-1
        )[..., 0]  # (B, gamma)
        u = jax.random.uniform(u_rng, (b, gamma))
        accept = u < p_draft
        a_row = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)
        amin = jnp.min(jnp.where(finished, gamma, a_row))

        # ---- per-row token at col amin:
        #   a_row > amin  -> the ACCEPTED draft d_{amin+1}
        #   a_row == amin -> residual resample from p_amin (d zeroed) — except
        #                    when amin == gamma (full acceptance): the bonus
        #                    position samples p_gamma unmasked ----
        x_sel = jax.lax.dynamic_index_in_dim(x, amin, 1, keepdims=False)  # (B, V)
        d_idx = jnp.minimum(amin, gamma - 1)
        d_sel = jax.lax.dynamic_index_in_dim(drafts, d_idx, 1, keepdims=False)  # (B,)
        rejected_here = (a_row == amin) & (amin < gamma)
        vocab_iota = jax.lax.broadcasted_iota(jnp.int32, x_sel.shape, 1)
        x_masked = jnp.where(
            rejected_here[:, None] & (vocab_iota == d_sel[:, None]),
            jnp.finfo(x_sel.dtype).min,
            x_sel,
        )
        resampled = jax.random.categorical(res_rng, x_masked, axis=-1).astype(jnp.int32)
        correction = jnp.where(a_row > amin, d_sel, resampled)

        # ---- emissions (same fixed-shape contract as the greedy path) ----
        col = jax.lax.broadcasted_iota(jnp.int32, (b, gamma + 1), 1)
        emit0 = jnp.concatenate([drafts, jnp.full((b, 1), pad, jnp.int32)], axis=1)
        emit = jnp.where(
            col < amin, emit0, jnp.where(col == amin, correction[:, None], pad)
        )
        emit = jnp.where(finished[:, None], pad, emit)
        hits = eos_hit(emit) & (col <= amin)
        first_eos = jnp.min(jnp.where(hits, col, gamma + 1), axis=1)
        emit = jnp.where(col > first_eos[:, None], pad, emit)
        new_finished = finished | (first_eos <= gamma)

        out = jax.lax.dynamic_update_slice(out, emit, (0, n_emitted))

        # ---- roll the target cache back to the accepted prefix ----
        new_index = t_cache["index"] - (gamma + 1) + (amin + 1)
        t_cache = dict(t_cache)
        max_len = t_cache["mask"].shape[1]
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
        t_cache["mask"] = jnp.where(slot < new_index, t_cache["mask"], 0)
        t_cache["pos"] = t_cache["pos"] - (t_cache["index"] - new_index)
        t_cache["index"] = new_index

        new_pending = jnp.where(new_finished, pad, correction)
        return (n_emitted + amin + 1, t_cache, new_pending, new_finished, out, iters + 1)

    def cond_w(carry):
        return cond(carry[:5])

    def body_w(carry):
        *inner, iters = carry
        return body(tuple(inner), iters)

    carry = (jnp.ones((), jnp.int32), t_cache, pending, fin0, out0, jnp.zeros((), jnp.int32))
    n_emitted, _, _, _, out, iters = jax.lax.while_loop(cond_w, body_w, carry)
    if return_stats:
        return out[:, :max_new], (jnp.minimum(n_emitted, max_new), iters)
    return out[:, :max_new]
