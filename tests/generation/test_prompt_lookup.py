"""Prompt-lookup (model-free) speculative decoding must be TOKEN-IDENTICAL to
plain greedy for ANY corpus — the guarantee is structural (verification
recomputes the target's own argmax at every position). Covered corpora:

- default (input_ids with padding/video positions masked),
- random garbage (alpha ~ 0: every draft rejected),
- ECHO corpus containing the target's own future output (alpha ~ 1: the
  workload shape of 16-shot narration, where generations echo the in-context
  example narrations — reference eilev/data/frame.py:179-266).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig, generate
from eilev_tpu.generation.speculative import build_lookup_corpus
from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration as VB


@pytest.fixture(scope="module")
def tiny():
    cfg = configs.tiny_config(text_model="opt", layers=4)
    model = VB(cfg)
    rng = np.random.default_rng(0)
    B, V, T, S = 2, 2, 2, 18
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(B * V, 3, T, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(B, S))
    mask = np.ones((B, S), np.int64)
    ids[0, :2] = 1  # left padding on row 0
    mask[0, :2] = 0
    vim = np.zeros((B, S), np.int64)
    vim[:, 3 : 3 + V * cfg.num_query_tokens] = 1
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
    )["params"]
    return cfg, model, params, ids, mask, pixel, vim


def _generate(tiny, max_new, **kw):
    cfg, model, params, ids, mask, pixel, vim = tiny
    return np.asarray(
        generate(
            model,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=GenerationConfig(
                max_new_tokens=max_new, pad_token_id=cfg.text_config.pad_token_id
            ),
            **kw,
        )
    )


@pytest.mark.parametrize("gamma,match_len", [(4, 3), (8, 2), (2, 1)])
def test_default_corpus_token_identical(tiny, gamma, match_len):
    plain = _generate(tiny, 12)
    pld = _generate(
        tiny, 12, draft="prompt_lookup", draft_tokens=gamma, draft_match_len=match_len
    )
    np.testing.assert_array_equal(plain, pld)


def test_random_corpus_token_identical(tiny):
    """Garbage corpus: every draft rejected, still exact greedy output."""
    cfg = tiny[0]
    ids = tiny[3]
    rng = np.random.default_rng(5)
    garbage = rng.integers(4, cfg.text_config.vocab_size, size=ids.shape)
    plain = _generate(tiny, 12)
    pld = _generate(
        tiny, 12, draft="prompt_lookup", lookup_corpus=jnp.asarray(garbage, jnp.int32)
    )
    np.testing.assert_array_equal(plain, pld)


def test_echo_corpus_token_identical_and_accepting(tiny):
    """Corpus seeded with the target's own greedy output (the alpha ~ 1 case):
    output must STILL be exact, and the lookup must actually accept drafts —
    proven by running with a huge gamma and checking the result equals greedy
    (any acceptance bookkeeping error would corrupt the emitted stream)."""
    cfg, model, params, ids, mask, pixel, vim = tiny
    plain = _generate(tiny, 12)
    # corpus rows: [prompt tokens..., generated tokens...] like a 17th shot
    corpus = np.concatenate(
        [build_lookup_corpus(jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(vim)), plain],
        axis=1,
    )
    pld = _generate(
        tiny, 12, draft="prompt_lookup", draft_tokens=8,
        lookup_corpus=jnp.asarray(corpus, jnp.int32),
    )
    np.testing.assert_array_equal(plain, pld)


@pytest.mark.slow
def test_eos_early_stop(tiny):
    """Custom eos = the 3rd greedy token: PLD must stop identically."""
    cfg, model, params, ids, mask, pixel, vim = tiny
    plain = _generate(tiny, 10)
    eos = int(plain[0, 2])
    gcfg = GenerationConfig(
        max_new_tokens=10, pad_token_id=cfg.text_config.pad_token_id, eos_token_id=(eos,)
    )
    ref = np.asarray(
        generate(
            model, {"params": params}, input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask), pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim), generation_config=gcfg,
        )
    )
    pld = np.asarray(
        generate(
            model, {"params": params}, input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask), pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim), generation_config=gcfg,
            draft="prompt_lookup",
        )
    )
    np.testing.assert_array_equal(ref, pld)


def test_build_lookup_corpus_masks():
    ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    mask = jnp.asarray([[0, 1, 1, 1]])
    vim = jnp.asarray([[0, 0, 1, 0]])
    out = np.asarray(build_lookup_corpus(ids, mask, vim))
    np.testing.assert_array_equal(out, [[-1, 6, -1, 8]])


def test_unknown_draft_rejected(tiny):
    with pytest.raises(ValueError, match="prompt_lookup"):
        _generate(tiny, 4, draft="tree_attention")


def test_int8_kv_compose(tiny):
    """prompt_lookup over an int8 KV cache: identical to int8-KV plain greedy
    (the rollback only touches mask/pos/index; quantized rows + scales stay
    in place behind the mask)."""
    import dataclasses

    from eilev_tpu import configs

    cfg, model, params, ids, mask, pixel, vim = tiny
    kcfg = configs.replace(
        cfg, text_config=dataclasses.replace(cfg.text_config, int8_kv_cache=True)
    )
    kmodel = VB(kcfg)
    kw = dict(
        input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
        pixel_values=jnp.asarray(pixel), video_input_mask=jnp.asarray(vim),
        generation_config=GenerationConfig(
            max_new_tokens=8, pad_token_id=cfg.text_config.pad_token_id
        ),
    )
    plain = np.asarray(generate(kmodel, {"params": params}, **kw))
    pld = np.asarray(generate(kmodel, {"params": params}, draft="prompt_lookup", **kw))
    np.testing.assert_array_equal(plain, pld)


def test_stats_acceptance(tiny):
    """Echo corpus accepts >1 token/verify-pass; garbage corpus exactly 1."""
    from eilev_tpu.generation.speculative import prompt_lookup_greedy_decode
    from eilev_tpu.models.opt import OPTForCausalLM

    cfg, model, params, ids, mask, pixel, vim = tiny
    plain = _generate(tiny, 12)
    embeds = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(pixel), jnp.asarray(vim),
        method=VB.embed_and_scatter,
    )
    lm_params = params["language_model"]
    target = OPTForCausalLM(cfg.text_config, dtype=model.dtype)
    gcfg = GenerationConfig(max_new_tokens=12, pad_token_id=cfg.text_config.pad_token_id)
    gcfg = gcfg.with_eos(cfg.text_config.eos_token_id)

    echo = np.concatenate(
        [np.asarray(build_lookup_corpus(jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(vim))), plain],
        axis=1,
    )
    out, (n_tok, iters) = prompt_lookup_greedy_decode(
        target, lm_params, jnp.asarray(echo, jnp.int32), embeds, jnp.asarray(mask),
        gcfg, gamma=8, return_stats=True,
    )
    np.testing.assert_array_equal(np.asarray(out), plain)
    assert int(n_tok) / int(iters) > 1.5, (int(n_tok), int(iters))

    garbage = np.random.default_rng(3).integers(
        4, cfg.text_config.vocab_size, size=ids.shape
    )
    out2, (n_tok2, iters2) = prompt_lookup_greedy_decode(
        target, lm_params, jnp.asarray(garbage, jnp.int32), embeds, jnp.asarray(mask),
        gcfg, gamma=8, return_stats=True,
    )
    np.testing.assert_array_equal(np.asarray(out2), plain)
    # a random corpus can still luck into single-token matches, but the
    # advance cannot exceed a couple tokens per pass on average
    assert int(iters2) >= int(n_tok2) / 3
