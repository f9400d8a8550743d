"""Prompt-lookup speculative SAMPLING must be DISTRIBUTION-identical to the
plain sampling loop (not bit-identical — the rng is consumed in a different
order). The guarantee is the rejection rule of speculative sampling
specialized to a point-mass draft: accept d with prob p(d), else resample
from p with d zeroed and renormalized — every emitted token is an exact draw
from the target's warped distribution (generation/speculative.py:
prompt_lookup_sample_decode).

Tests:
- point-mass limit (temperature -> 0): exactly equal to plain greedy,
- empirical per-position marginals vs the plain sampling loop (fixed seed
  list -> deterministic pass/fail; top_k bounds the support so the
  total-variation noise floor is small),
- eos/pad contract under sampling,
- dispatch: generate(draft="prompt_lookup", do_sample=True) routes here and
  logits processors are rejected.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig, generate
from eilev_tpu.generation.decoding import _greedy_sample_decoder_only
from eilev_tpu.generation.speculative import (
    build_lookup_corpus,
    prompt_lookup_sample_decode,
)
from eilev_tpu.models.opt import OPTForCausalLM
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
    ids[0, :2] = 1
    mask[0, :2] = 0
    vim = np.zeros((B, S), np.int64)
    vim[:, 3 : 3 + V * cfg.num_query_tokens] = 1
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
    )["params"]
    embeds = model.apply(
        {"params": params},
        jnp.asarray(ids),
        jnp.asarray(pixel),
        jnp.asarray(vim),
        method=VB.embed_and_scatter,
    )
    return cfg, model, params, ids, mask, pixel, vim, embeds


def _gen_kwargs(tiny):
    cfg, model, params, ids, mask, pixel, vim, _ = tiny
    return dict(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
    )


def test_point_mass_limit_equals_greedy(tiny):
    """temperature -> 0 makes the warped distribution a point mass at the
    argmax, so speculative sampling must emit exactly the greedy tokens."""
    cfg = tiny[0]
    model, params = tiny[1], tiny[2]
    greedy = np.asarray(
        generate(
            model, {"params": params}, **_gen_kwargs(tiny),
            generation_config=GenerationConfig(
                max_new_tokens=10, pad_token_id=cfg.text_config.pad_token_id
            ),
        )
    )
    for seed in (0, 7):
        sampled = np.asarray(
            generate(
                model, {"params": params}, **_gen_kwargs(tiny),
                generation_config=GenerationConfig(
                    max_new_tokens=10,
                    pad_token_id=cfg.text_config.pad_token_id,
                    do_sample=True,
                    temperature=1e-7,
                ),
                draft="prompt_lookup", draft_tokens=4, draft_match_len=2,
                rng=jax.random.PRNGKey(seed),
            )
        )
        np.testing.assert_array_equal(greedy, sampled)


def _marginals(tokens, vocab):
    """tokens: (N, B, L) -> per (row, position) empirical distributions."""
    n = tokens.shape[0]
    out = {}
    for b in range(tokens.shape[1]):
        for pos in range(tokens.shape[2]):
            counts = np.bincount(tokens[:, b, pos], minlength=vocab)
            out[(b, pos)] = counts / n
    return out


@pytest.mark.slow
def test_marginals_match_plain_sampling(tiny):
    """Per-(row, position) empirical marginals of speculative sampling match
    the plain sampling loop's. Fixed seed list -> deterministic; top_k=4
    bounds the support so the TV noise floor at N=1200 is ~0.04."""
    cfg, model, params, ids, mask, pixel, vim, embeds = tiny
    tcfg = cfg.text_config
    gen_cfg = GenerationConfig(
        max_new_tokens=3,
        pad_token_id=tcfg.pad_token_id,
        eos_token_id=(),  # keep every position live so marginals are clean
        do_sample=True,
        temperature=1.3,
        top_k=4,
    )
    corpus = build_lookup_corpus(jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(vim))
    target_lm = OPTForCausalLM(tcfg, dtype=model.dtype)
    lm_params = params["language_model"]
    mask_d = jnp.asarray(mask, jnp.int32)

    n = 1200
    plain, spec = [], []
    for seed in range(n):
        key = jax.random.PRNGKey(seed)
        plain.append(
            np.asarray(
                _greedy_sample_decoder_only(
                    model, {"params": params}, embeds, mask_d, gen_cfg, key
                )
            )
        )
        spec.append(
            np.asarray(
                prompt_lookup_sample_decode(
                    target_lm, lm_params, jnp.asarray(corpus, jnp.int32),
                    embeds, mask_d, gen_cfg, key, gamma=3, match_len=2,
                )
            )
        )
    mp = _marginals(np.stack(plain), tcfg.vocab_size)
    ms = _marginals(np.stack(spec), tcfg.vocab_size)
    for k in mp:
        tv = 0.5 * np.abs(mp[k] - ms[k]).sum()
        assert tv < 0.10, f"(row, pos)={k}: TV={tv:.3f}"


def test_eos_pad_contract_under_sampling(tiny):
    """Wherever an eos is emitted, every later position must be pad."""
    cfg, model, params, ids, mask, pixel, vim, embeds = tiny
    tcfg = cfg.text_config
    # high temperature makes every token (incl. the chosen eos id) likely
    gen_cfg = GenerationConfig(
        max_new_tokens=8,
        pad_token_id=tcfg.pad_token_id,
        eos_token_id=(5, 9),
        do_sample=True,
        temperature=3.0,
    )
    corpus = build_lookup_corpus(jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(vim))
    target_lm = OPTForCausalLM(tcfg, dtype=model.dtype)
    lm_params = params["language_model"]
    mask_d = jnp.asarray(mask, jnp.int32)
    pad = tcfg.pad_token_id
    saw_eos = False
    for seed in range(40):
        out = np.asarray(
            prompt_lookup_sample_decode(
                target_lm, lm_params, jnp.asarray(corpus, jnp.int32),
                embeds, mask_d, gen_cfg, jax.random.PRNGKey(seed),
                gamma=3, match_len=2,
            )
        )
        for row in out:
            eos_pos = np.where((row == 5) | (row == 9))[0]
            if eos_pos.size:
                saw_eos = True
                assert np.all(row[eos_pos[0] + 1 :] == pad)
    assert saw_eos, "temperature 3.0 over 40 seeds never emitted eos — bad setup"


def test_dispatch_and_processor_guard(tiny):
    cfg, model, params = tiny[0], tiny[1], tiny[2]
    out = generate(
        model, {"params": params}, **_gen_kwargs(tiny),
        generation_config=GenerationConfig(
            max_new_tokens=6, pad_token_id=cfg.text_config.pad_token_id,
            do_sample=True, temperature=1.5,
        ),
        draft="prompt_lookup", rng=jax.random.PRNGKey(3),
    )
    assert out.shape == (2, 6)
    with pytest.raises(NotImplementedError):
        generate(
            model, {"params": params}, **_gen_kwargs(tiny),
            generation_config=GenerationConfig(
                max_new_tokens=6, pad_token_id=cfg.text_config.pad_token_id,
                do_sample=True, repetition_penalty=1.2,
            ),
            draft="prompt_lookup", rng=jax.random.PRNGKey(3),
        )


def test_sampling_warpers_trace_on_3d_verify_logits(tiny):
    """typical_p/min_p/epsilon/eta warp the (B, gamma+1, V) verify logits —
    regression for the 2-D-only typical scatter (ADVICE r4 trace crash)."""
    cfg, model, params = tiny[0], tiny[1], tiny[2]
    out = generate(
        model, {"params": params}, **_gen_kwargs(tiny),
        generation_config=GenerationConfig(
            max_new_tokens=6, pad_token_id=cfg.text_config.pad_token_id,
            do_sample=True, temperature=1.5, typical_p=0.9, min_p=0.01,
        ),
        draft="prompt_lookup", rng=jax.random.PRNGKey(7),
    )
    assert out.shape == (2, 6)
