"""Speculative decoding must be TOKEN-IDENTICAL to plain greedy, for any
draft (the guarantee is structural: verification recomputes the target's own
argmax), and the multi-token cache-append verify forward must match
step-by-step decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig, decoding
from eilev_tpu.models import opt as opt_mod
from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration as VB


pytestmark = pytest.mark.slow  # heavy equivalence/integration chain


@pytest.fixture(scope="module")
def tiny():
    cfg = configs.tiny_config(text_model="opt", layers=4)
    model = VB(cfg)
    rng = np.random.default_rng(0)
    B, V, T, S = 2, 2, 2, 18
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(B * V, 3, T, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(B, S))
    vim = np.zeros((B, S), np.int64)
    vim[:, 1 : 1 + V * cfg.num_query_tokens] = 1
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
    )["params"]
    return cfg, model, params, ids, pixel, vim


def test_cache_append_matches_stepwise(tiny):
    """A gamma+1-token cache_append forward == gamma+1 single-token steps."""
    cfg, model, params, ids, pixel, vim = tiny
    B = ids.shape[0]
    embeds = model.apply({"params": params}, jnp.asarray(ids), method=VB.lm_embed)
    block_ids = jnp.asarray(
        np.random.default_rng(1).integers(4, cfg.text_config.vocab_size, size=(B, 3))
    )
    block = model.apply({"params": params}, block_ids, method=VB.lm_embed)

    def prefill():
        cache = opt_mod.init_cache(cfg.text_config, B, ids.shape[1] + 8, jnp.float32)
        logits, cache = model.apply(
            {"params": params}, embeds, attention_mask=jnp.ones_like(jnp.asarray(ids)),
            cache=cache, method=VB.lm_forward,
        )
        return logits, cache

    # stepwise
    _, cache = prefill()
    step_logits = []
    for j in range(3):
        lg, cache = model.apply(
            {"params": params}, block[:, j : j + 1],
            attention_mask=jnp.ones((B, 1), jnp.int32), cache=cache,
            method=VB.lm_forward,
        )
        step_logits.append(lg[:, 0])
    # block append
    _, cache2 = prefill()
    blk_logits, cache2 = model.apply(
        {"params": params}, block, attention_mask=jnp.ones((B, 3), jnp.int32),
        cache=cache2, cache_append=True, method=VB.lm_forward,
    )
    for j in range(3):
        np.testing.assert_allclose(
            np.asarray(blk_logits[:, j]), np.asarray(step_logits[j]),
            rtol=2e-5, atol=2e-5,
        )
    assert int(cache2["index"]) == int(cache["index"])


@pytest.mark.parametrize("draft_layers,gamma", [(1, 3), (2, 2), (4, 4)])
def test_speculative_tokens_identical_to_greedy(tiny, draft_layers, gamma):
    """Any draft quality (1-layer ≈ bad, 4-layer == the target itself ≈
    perfect acceptance): output must equal plain greedy exactly."""
    cfg, model, params, ids, pixel, vim = tiny
    gen = GenerationConfig(max_new_tokens=10, pad_token_id=1)

    plain = np.asarray(
        decoding.generate(
            model, {"params": params}, input_ids=jnp.asarray(ids),
            pixel_values=jnp.asarray(pixel), video_input_mask=jnp.asarray(vim),
            generation_config=gen,
        )
    )
    spec = np.asarray(
        decoding.generate(
            model, {"params": params}, input_ids=jnp.asarray(ids),
            pixel_values=jnp.asarray(pixel), video_input_mask=jnp.asarray(vim),
            generation_config=gen, draft_layers=draft_layers, draft_tokens=gamma,
        )
    )
    np.testing.assert_array_equal(spec, plain)


def test_speculative_respects_eos(tiny):
    """Force an early eos (the most likely token at some step) and check the
    pad-after-eos contract survives the block emissions."""
    cfg, model, params, ids, pixel, vim = tiny
    # use a broad eos set so at least one row terminates early
    gen = GenerationConfig(
        max_new_tokens=12, pad_token_id=1,
        eos_token_id=tuple(range(0, cfg.text_config.vocab_size, 3)),
    )
    plain = np.asarray(
        decoding.generate(
            model, {"params": params}, input_ids=jnp.asarray(ids),
            pixel_values=jnp.asarray(pixel), video_input_mask=jnp.asarray(vim),
            generation_config=gen,
        )
    )
    spec = np.asarray(
        decoding.generate(
            model, {"params": params}, input_ids=jnp.asarray(ids),
            pixel_values=jnp.asarray(pixel), video_input_mask=jnp.asarray(vim),
            generation_config=gen, draft_layers=2, draft_tokens=3,
        )
    )
    np.testing.assert_array_equal(spec, plain)


def test_speculative_llama_matches_stepwise_greedy():
    """LLaMA path: cache_append verify + spec loop == plain stepwise greedy."""
    from eilev_tpu.configs import LlamaConfig
    from eilev_tpu.models.llama import LlamaForCausalLM
    from eilev_tpu.generation.speculative import (
        make_self_draft,
        speculative_greedy_decode,
    )

    cfg = LlamaConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        max_position_embeddings=128,
    )
    model = LlamaForCausalLM(cfg)

    def init_all(mdl):
        return mdl(mdl.embed(jnp.zeros((1, 4), jnp.int32)))

    params = model.init(jax.random.PRNGKey(0), method=init_all)["params"]
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(2, 9)))
    mask = jnp.ones_like(ids)
    embeds = model.apply({"params": params}, ids, method=LlamaForCausalLM.embed)
    max_new = 8

    # plain stepwise greedy reference
    cache = opt_mod.init_cache(cfg, 2, ids.shape[1] + max_new + 8, jnp.float32)
    logits, cache = model.apply(
        {"params": params}, embeds, attention_mask=mask, cache=cache
    )
    toks = []
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    for _ in range(max_new):
        toks.append(np.asarray(tok))
        step = model.apply({"params": params}, tok[:, None], method=LlamaForCausalLM.embed)
        logits, cache = model.apply(
            {"params": params}, step, attention_mask=jnp.ones((2, 1), jnp.int32),
            cache=cache,
        )
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    plain = np.stack(toks, axis=1)

    gen = GenerationConfig(max_new_tokens=max_new, pad_token_id=0,
                           eos_token_id=(cfg.vocab_size + 5,))
    for draft_layers, gamma in [(1, 3), (4, 2)]:
        draft_model, draft_params = make_self_draft(cfg, params, draft_layers, None)
        draft_model = type(draft_model)(draft_model.config)  # fp32 like target
        spec = np.asarray(
            speculative_greedy_decode(
                LlamaForCausalLM(cfg), params, draft_model, draft_params,
                embeds, mask, gen, gamma=gamma,
            )
        )
        np.testing.assert_array_equal(spec, plain)
