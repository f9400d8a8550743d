"""HF logits-processor parity: repetition_penalty / no_repeat_ngram_size /
min_new_tokens, token-identical vs HF ``generate`` on the tiny torch oracle.

The reference CLI forwards arbitrary HF GenerationConfig JSON to HF generate
(/root/reference/scripts/general/generate_narration_texts.py:203), so these
knobs are part of its behavior surface even though no reference test covers
them; ours are checked token-identical (greedy + beam, OPT + T5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from eilev_tpu.generation import (
    GenerationConfig,
    generate,
    generation_config_from_json,
)
from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration

from ..models.hf_util import make_oracle

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture(scope="module")
def opt_setup():
    model, cfg, params = make_oracle("opt")
    rng = np.random.default_rng(11)
    b, v_per, t, s = 2, 2, 2, 20
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(b * v_per, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    ids[0, :3] = 1
    mask[0, :3] = 0
    vim = np.zeros((b, s), np.int64)
    vim[:, 4 : 4 + v_per * cfg.num_query_tokens] = 1
    m = VideoBlipForConditionalGeneration(cfg)
    return model, cfg, params, m, ids, mask, pixel, vim


def _hf_generate(model, ids, mask, pixel, vim, **kwargs):
    with torch.no_grad():
        return (
            model.generate(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
                pixel_values=torch.tensor(pixel),
                video_input_mask=torch.tensor(vim),
                **kwargs,
            )
            .cpu()
            .numpy()
        )


def _ours(m, params, ids, mask, pixel, vim, gen_cfg):
    return np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=gen_cfg,
        )
    )


def _check(ref, ours):
    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


@pytest.mark.parametrize("penalty", [1.4, 0.6])
def test_repetition_penalty_greedy(opt_setup, penalty):
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    max_new = 10
    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=max_new, do_sample=False,
        repetition_penalty=penalty,
    )
    ours = _ours(
        m, params, ids, mask, pixel, vim,
        GenerationConfig(
            max_new_tokens=max_new,
            pad_token_id=cfg.text_config.pad_token_id,
            repetition_penalty=penalty,
        ),
    )
    _check(ref, ours)


@pytest.mark.parametrize("ngram", [1, 2, 3])
def test_no_repeat_ngram_greedy(opt_setup, ngram):
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    max_new = 12
    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=max_new, do_sample=False,
        no_repeat_ngram_size=ngram,
    )
    ours = _ours(
        m, params, ids, mask, pixel, vim,
        GenerationConfig(
            max_new_tokens=max_new,
            pad_token_id=cfg.text_config.pad_token_id,
            no_repeat_ngram_size=ngram,
        ),
    )
    _check(ref, ours)


def test_min_new_tokens_greedy(opt_setup):
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    max_new = 10
    # choose the token greedy emits at step 1 as eos: without min_new_tokens
    # generation would stop there; with it the eos is banned until step 6
    probe = _hf_generate(model, ids, mask, pixel, vim, max_new_tokens=max_new, do_sample=False)
    eos = int(probe[0, 1])
    kwargs = dict(
        max_new_tokens=max_new, do_sample=False, eos_token_id=eos,
        pad_token_id=cfg.text_config.pad_token_id, min_new_tokens=6,
    )
    ref = _hf_generate(model, ids, mask, pixel, vim, **kwargs)
    ours = _ours(
        m, params, ids, mask, pixel, vim,
        GenerationConfig(
            max_new_tokens=max_new,
            pad_token_id=cfg.text_config.pad_token_id,
            eos_token_id=(eos,),
            min_new_tokens=6,
        ),
    )
    _check(ref, ours)


def test_combined_processors_greedy(opt_setup):
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    max_new = 12
    kwargs = dict(repetition_penalty=1.3, no_repeat_ngram_size=2, min_new_tokens=4)
    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=max_new, do_sample=False, **kwargs
    )
    ours = _ours(
        m, params, ids, mask, pixel, vim,
        GenerationConfig(
            max_new_tokens=max_new, pad_token_id=cfg.text_config.pad_token_id, **kwargs
        ),
    )
    _check(ref, ours)


def test_beam_with_processors(opt_setup):
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    max_new = 8
    kwargs = dict(repetition_penalty=1.3, no_repeat_ngram_size=2)
    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=max_new, do_sample=False,
        num_beams=3, pad_token_id=cfg.text_config.pad_token_id, **kwargs,
    )
    ours = _ours(
        m, params, ids, mask, pixel, vim,
        GenerationConfig(
            max_new_tokens=max_new, num_beams=3,
            pad_token_id=cfg.text_config.pad_token_id, **kwargs,
        ),
    )
    _check(ref, ours)


def test_t5_processors_greedy_and_beam():
    model, cfg, params = make_oracle("t5")
    rng = np.random.default_rng(13)
    b, t, s = 2, 2, 12
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(b, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    vim = np.zeros((b, s), np.int64)
    vim[:, : cfg.num_query_tokens] = 1
    m = VideoBlipForConditionalGeneration(cfg)

    kwargs = dict(repetition_penalty=1.5, no_repeat_ngram_size=2)
    for extra_hf, extra_ours in [
        (dict(), dict()),
        (dict(num_beams=3), dict(num_beams=3)),
    ]:
        ref = _hf_generate(
            model, ids, mask, pixel, vim, max_new_tokens=8, do_sample=False,
            **kwargs, **extra_hf,
        )
        ours = _ours(
            m, params, ids, mask, pixel, vim,
            GenerationConfig(
                max_new_tokens=8,
                pad_token_id=cfg.text_config.pad_token_id,
                eos_token_id=(cfg.text_config.eos_token_id,),
                **kwargs, **extra_ours,
            ),
        )
        n = min(ref.shape[1], ours.shape[1])
        np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


# ---------------------------------------------------------------------------
# JSON contract (the reference CLI's --generation_config flag)
# ---------------------------------------------------------------------------


def test_warper_logits_parity_vs_hf():
    """Each fixed-shape sampling warper must be logits-identical to its HF
    class (same removed set, same surviving values) on random logits."""
    from transformers.generation.logits_process import (
        EpsilonLogitsWarper,
        EtaLogitsWarper,
        MinPLogitsWarper,
        TopKLogitsWarper,
        TopPLogitsWarper,
        TypicalLogitsWarper,
    )

    from eilev_tpu.generation.decoding import (
        _filter_epsilon,
        _filter_eta,
        _filter_min_p,
        _filter_top_k,
        _filter_top_p,
        _filter_typical,
    )

    rng = np.random.default_rng(3)
    logits = (rng.normal(scale=3.0, size=(4, 50))).astype(np.float32)
    dummy_ids = torch.zeros((4, 1), dtype=torch.long)
    cases = [
        ("min_p", lambda x: _filter_min_p(x, 0.2), MinPLogitsWarper(0.2)),
        (
            "min_p keep3",
            lambda x: _filter_min_p(x, 0.6, 3),
            MinPLogitsWarper(0.6, min_tokens_to_keep=3),
        ),
        ("typical", lambda x: _filter_typical(x, 0.7), TypicalLogitsWarper(0.7)),
        (
            "typical keep2",
            lambda x: _filter_typical(x, 0.2, 2),
            TypicalLogitsWarper(0.2, min_tokens_to_keep=2),
        ),
        ("epsilon", lambda x: _filter_epsilon(x, 0.05), EpsilonLogitsWarper(0.05)),
        (
            "epsilon keep4",
            lambda x: _filter_epsilon(x, 0.9, 4),
            EpsilonLogitsWarper(0.9, min_tokens_to_keep=4),
        ),
        ("eta", lambda x: _filter_eta(x, 0.05), EtaLogitsWarper(0.05)),
        (
            "eta keep4",
            lambda x: _filter_eta(x, 0.9, 4),
            EtaLogitsWarper(0.9, min_tokens_to_keep=4),
        ),
        (
            "top_p keep2",
            lambda x: _filter_top_p(x, 0.6, 2),
            TopPLogitsWarper(0.6, min_tokens_to_keep=2),
        ),
        (
            "top_k keep2",
            lambda x: _filter_top_k(x, 1, 2),
            TopKLogitsWarper(1, min_tokens_to_keep=2),
        ),
    ]
    for name, ours_fn, hf in cases:
        ref = hf(dummy_ids, torch.tensor(logits)).numpy()
        ours = np.asarray(ours_fn(jnp.asarray(logits)))
        # our top_k/top_p mask with finfo.min, the rest with -inf; HF uses -inf
        ref_removed = np.isneginf(ref)
        ours_removed = np.isneginf(ours) | (ours <= np.finfo(np.float32).min)
        np.testing.assert_array_equal(ours_removed, ref_removed, err_msg=name)
        np.testing.assert_allclose(
            np.where(ref_removed, 0.0, ours),
            np.where(ref_removed, 0.0, ref),
            rtol=1e-6,
            err_msg=name,
        )


def test_suppress_tokens_greedy(opt_setup):
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    pad = cfg.text_config.pad_token_id
    plain = _ours(m, params, ids, mask, pixel, vim,
                  GenerationConfig(max_new_tokens=6, pad_token_id=pad))
    banned = int(plain[0, 0])  # suppress the very first greedy pick
    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=6, do_sample=False,
        suppress_tokens=[banned],
    )
    ours = _ours(m, params, ids, mask, pixel, vim,
                 GenerationConfig(max_new_tokens=6, pad_token_id=pad,
                                  suppress_tokens=(banned,)))
    _check(ref, ours)
    assert banned not in ours


def test_begin_suppress_tokens_greedy(opt_setup):
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    pad = cfg.text_config.pad_token_id
    plain = _ours(m, params, ids, mask, pixel, vim,
                  GenerationConfig(max_new_tokens=6, pad_token_id=pad))
    banned = int(plain[0, 0])
    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=6, do_sample=False,
        begin_suppress_tokens=[banned],
    )
    ours = _ours(m, params, ids, mask, pixel, vim,
                 GenerationConfig(max_new_tokens=6, pad_token_id=pad,
                                  begin_suppress_tokens=(banned,)))
    _check(ref, ours)
    assert int(ours[0, 0]) != banned


def test_bad_words_ids_greedy(opt_setup):
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    pad = cfg.text_config.pad_token_id
    plain = _ours(m, params, ids, mask, pixel, vim,
                  GenerationConfig(max_new_tokens=8, pad_token_id=pad))
    # ban the 2-gram the plain run generates at positions 1-2 plus a 1-token word
    bad = [[int(plain[0, 1]), int(plain[0, 2])], [int(plain[1, 0])]]
    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=8, do_sample=False,
        bad_words_ids=bad,
    )
    ours = _ours(m, params, ids, mask, pixel, vim,
                 GenerationConfig(max_new_tokens=8, pad_token_id=pad,
                                  bad_words_ids=tuple(tuple(w) for w in bad)))
    _check(ref, ours)


def test_bad_words_prefix_fills_entire_history(opt_setup):
    """HF skips a bad word while len(word) > visible history (the
    SequenceBias guard): a 2-token word whose prefix is the FIRST generated
    token must not be banned at step 1 (history is only 1 token there).
    Regression for a one-step-early ban (ADVICE r4)."""
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    pad = cfg.text_config.pad_token_id
    plain = _ours(m, params, ids, mask, pixel, vim,
                  GenerationConfig(max_new_tokens=6, pad_token_id=pad))
    # word = the first two greedy tokens: at step 1 the generated history is
    # exactly word[:-1], the case where the guard must NOT fire yet
    bad = [[int(plain[0, 0]), int(plain[0, 1])]]
    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=6, do_sample=False,
        bad_words_ids=bad,
    )
    ours = _ours(m, params, ids, mask, pixel, vim,
                 GenerationConfig(max_new_tokens=6, pad_token_id=pad,
                                  bad_words_ids=tuple(tuple(w) for w in bad)))
    _check(ref, ours)
    # HF emits the word's second token at step 1 (no ban yet)
    assert int(ours[0, 1]) == int(ref[0, 1])


def test_typical_warp_shape_agnostic():
    """_filter_typical must accept leading batch dims beyond 2-D: the
    speculative verify path warps (B, gamma+1, V) logits (ADVICE r4)."""
    from eilev_tpu.generation.decoding import _filter_typical

    rng = np.random.default_rng(5)
    logits = rng.normal(scale=3.0, size=(2, 3, 40)).astype(np.float32)
    out3 = np.asarray(_filter_typical(jnp.asarray(logits), 0.6))
    out2 = np.asarray(
        _filter_typical(jnp.asarray(logits.reshape(6, 40)), 0.6)
    ).reshape(2, 3, 40)
    np.testing.assert_array_equal(out3, out2)


def test_forced_eos_greedy(opt_setup):
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    pad = cfg.text_config.pad_token_id
    eos = cfg.text_config.eos_token_id
    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=5, do_sample=False,
        forced_eos_token_id=eos,
    )
    ours = _ours(m, params, ids, mask, pixel, vim,
                 GenerationConfig(max_new_tokens=5, pad_token_id=pad,
                                  forced_eos_token_id=(eos,)))
    _check(ref, ours)
    assert int(ours[0, min(4, ours.shape[1] - 1)]) in (eos, pad)


def test_min_length_translates_to_min_new(opt_setup):
    """HF counts min_length over prompt + generated on the inputs_embeds path
    (it subtracts the embeds length in _prepare_generated_length); with a
    20-token prompt, min_length=23 means at least 3 new tokens."""
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    pad = cfg.text_config.pad_token_id
    prompt_len = ids.shape[1]
    plain = _ours(m, params, ids, mask, pixel, vim,
                  GenerationConfig(max_new_tokens=8, pad_token_id=pad))
    fake_eos = int(plain[0, 0])  # force "early eos" pressure
    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=8, do_sample=False,
        min_length=prompt_len + 3, eos_token_id=fake_eos, pad_token_id=pad,
    )
    ours = _ours(m, params, ids, mask, pixel, vim,
                 GenerationConfig(max_new_tokens=8, pad_token_id=pad,
                                  min_length=prompt_len + 3,
                                  eos_token_id=(fake_eos,)))
    _check(ref, ours)


def test_t5_forced_bos_greedy():
    model, cfg, params = make_oracle("t5")
    rng = np.random.default_rng(21)
    b, t, s = 2, 2, 12
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(b, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    vim = np.zeros((b, s), np.int64)
    vim[:, : cfg.num_query_tokens] = 1
    m = VideoBlipForConditionalGeneration(cfg)
    forced = 7
    ref = _hf_generate(model, ids, mask, pixel, vim, max_new_tokens=5,
                       do_sample=False, forced_bos_token_id=forced)
    ours = _ours(m, params, ids, mask, pixel, vim,
                 GenerationConfig(max_new_tokens=5,
                                  pad_token_id=cfg.text_config.pad_token_id,
                                  eos_token_id=(cfg.text_config.eos_token_id,),
                                  forced_bos_token_id=forced))
    _check(ref, ours)
    assert int(ours[0, 1]) == forced  # position 0 is decoder_start


def test_max_length_greedy(opt_setup):
    """HF max_length counts prompt + generated on the inputs_embeds path; a
    20-token prompt with max_length=26 yields at most 6 new tokens."""
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    pad = cfg.text_config.pad_token_id
    prompt_len = ids.shape[1]
    ref = _hf_generate(
        model, ids, mask, pixel, vim, do_sample=False, max_length=prompt_len + 6,
    )
    cfg_json = generation_config_from_json(
        {"max_length": prompt_len + 6}, pad_token_id=pad
    )
    ours = _ours(m, params, ids, mask, pixel, vim, cfg_json)
    assert ours.shape[1] <= 6
    _check(ref, ours)
    # max_length not exceeding the prompt dies the way HF does
    with pytest.raises(ValueError, match="max_length"):
        _ours(m, params, ids, mask, pixel, vim,
              generation_config_from_json({"max_length": 5}, pad_token_id=pad))


def test_from_json_new_keys_roundtrip():
    cfg = generation_config_from_json(
        {
            "do_sample": True,
            "min_p": 0.1,
            "typical_p": 0.8,
            "epsilon_cutoff": 0.01,
            "eta_cutoff": 0.02,
            "bad_words_ids": [[3, 4], [5]],
            "suppress_tokens": [9],
            "begin_suppress_tokens": [10, 11],
            "forced_eos_token_id": 2,
            "forced_bos_token_id": 1,
            "min_length": 4,
        },
        pad_token_id=1,
    )
    assert cfg.min_p == 0.1 and cfg.typical_p == 0.8
    assert cfg.epsilon_cutoff == 0.01 and cfg.eta_cutoff == 0.02
    assert cfg.bad_words_ids == ((3, 4), (5,))
    assert cfg.suppress_tokens == (9,)
    assert cfg.begin_suppress_tokens == (10, 11)
    assert cfg.forced_eos_token_id == (2,)
    assert cfg.forced_bos_token_id == 1
    assert cfg.min_length == 4
    assert hash(cfg)  # stays hashable (jit static arg)
    cfg = generation_config_from_json(
        {"num_beams": 4, "num_beam_groups": 2, "diversity_penalty": 1.3},
        pad_token_id=1,
    )
    assert cfg.num_beam_groups == 2 and cfg.diversity_penalty == 1.3
    assert hash(cfg)


def test_from_json_max_length_precedence():
    cfg = generation_config_from_json(
        {"max_length": 10, "max_new_tokens": 7}, pad_token_id=1
    )
    # HF: max_new_tokens wins when both are present
    assert cfg.max_new_tokens == 7 and cfg.max_length is None
    cfg = generation_config_from_json({"max_length": 10}, pad_token_id=1)
    assert cfg.max_length == 10


def test_from_json_supported_keys():
    cfg = generation_config_from_json(
        {
            "max_new_tokens": 16,
            "num_beams": 5,
            "length_penalty": -1,
            "eos_token_id": 50118,
            "repetition_penalty": 1.2,
            "no_repeat_ngram_size": 3,
            "min_new_tokens": 2,
            "use_cache": True,  # silently ignored (always on)
        },
        pad_token_id=1,
    )
    assert cfg.max_new_tokens == 16
    assert cfg.num_beams == 5
    assert cfg.length_penalty == -1
    assert cfg.eos_token_id == (50118,)
    assert cfg.repetition_penalty == 1.2
    assert cfg.no_repeat_ngram_size == 3
    assert cfg.min_new_tokens == 2
    assert cfg.pad_token_id == 1


def test_from_json_default_max_new():
    cfg = generation_config_from_json({}, pad_token_id=0, default_max_new_tokens=512)
    assert cfg.max_new_tokens == 512


def test_from_json_rejects_unsupported():
    with pytest.raises(ValueError, match="not implemented.*supported keys"):
        generation_config_from_json({"force_words_ids": [[3]]}, pad_token_id=1)
    with pytest.raises(ValueError, match="not a recognized.*supported keys"):
        generation_config_from_json({"nonsense_key": 3}, pad_token_id=1)


def test_from_json_penalty_alpha():
    """penalty_alpha is accepted (contrastive search, round 5); HF's null
    default maps to 0.0 (off)."""
    cfg = generation_config_from_json({"penalty_alpha": 0.6, "top_k": 4}, pad_token_id=1)
    assert cfg.penalty_alpha == 0.6 and cfg.top_k == 4
    cfg = generation_config_from_json({"penalty_alpha": None}, pad_token_id=1)
    assert cfg.penalty_alpha == 0.0
    assert hash(cfg)


def test_from_json_num_return_sequences():
    cfg = generation_config_from_json(
        {"num_return_sequences": 3, "do_sample": True}, pad_token_id=1
    )
    assert cfg.num_return_sequences == 3


def test_sequence_bias_greedy(opt_setup):
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    pad = cfg.text_config.pad_token_id
    plain = _ours(m, params, ids, mask, pixel, vim,
                  GenerationConfig(max_new_tokens=8, pad_token_id=pad))
    # push the first greedy pick away (length-1) and pull a 2-token
    # continuation of the plain step-0..1 pair somewhere else (length-2)
    bias = [[[int(plain[0, 0])], -100.0], [[int(plain[1, 0]), int(plain[1, 1])], 5.0]]
    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=8, do_sample=False,
        sequence_bias=bias,
    )
    ours = _ours(m, params, ids, mask, pixel, vim,
                 GenerationConfig(
                     max_new_tokens=8, pad_token_id=pad,
                     sequence_bias=tuple((tuple(s), b) for s, b in bias)))
    _check(ref, ours)
    assert int(ours[0, 0]) != int(plain[0, 0])


def test_sequence_bias_unit_parity():
    """_process_scores' sequence-bias math vs HF SequenceBiasLogitsProcessor
    on a crafted history where 1-token, matching-2-token and non-matching
    sequences all fire."""
    from transformers.generation.logits_process import SequenceBiasLogitsProcessor

    from eilev_tpu.generation.decoding import _process_scores

    rng = np.random.default_rng(5)
    scores = rng.normal(scale=2.0, size=(3, 30)).astype(np.float32)
    hist = rng.integers(1, 30, size=(3, 6)).astype(np.int32)
    hist[0, -2:] = [7, 8]  # row 0 tail matches (7, 8) -> completes (7, 8, 9)
    bias = [[[4], 3.5], [[7, 8, 9], -6.0], [[1, 2, 3], 2.0]]
    hf = SequenceBiasLogitsProcessor(sequence_bias=bias)
    ref = hf(torch.tensor(hist, dtype=torch.long), torch.tensor(scores)).numpy()
    cfg = GenerationConfig(
        sequence_bias=tuple((tuple(s), b) for s, b in bias), pad_token_id=0
    )
    ours = np.asarray(
        _process_scores(jnp.asarray(scores), cfg, jnp.asarray(hist),
                        jnp.int32(6), jnp.int32(6))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_exponential_decay_length_penalty_greedy(opt_setup):
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    pad = cfg.text_config.pad_token_id
    plain = _ours(m, params, ids, mask, pixel, vim,
                  GenerationConfig(max_new_tokens=10, pad_token_id=pad))
    eos = int(plain[0, 5])  # a token greedy picks mid-way: decay pulls it early
    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=10, do_sample=False,
        eos_token_id=eos, pad_token_id=pad,
        exponential_decay_length_penalty=(1, 1.7),
    )
    ours = _ours(m, params, ids, mask, pixel, vim,
                 GenerationConfig(max_new_tokens=10, pad_token_id=pad,
                                  eos_token_id=(eos,),
                                  exponential_decay_length_penalty=(1, 1.7)))
    _check(ref, ours)


def test_exponential_decay_unit_parity():
    from transformers.generation.logits_process import ExponentialDecayLengthPenalty

    from eilev_tpu.generation.decoding import _process_scores

    rng = np.random.default_rng(6)
    scores = rng.normal(scale=2.0, size=(2, 20)).astype(np.float32)
    eos = [3, 11]
    for cur_len, fires in [(5, True), (2, False)]:
        hf = ExponentialDecayLengthPenalty((2, 1.6), eos, input_ids_seq_length=0)
        dummy_ids = torch.zeros((2, cur_len), dtype=torch.long)
        ref = hf(dummy_ids, torch.tensor(scores)).numpy()
        cfg = GenerationConfig(
            exponential_decay_length_penalty=(2, 1.6),
            eos_token_id=tuple(eos), pad_token_id=0,
        )
        hist = jnp.zeros((2, 8), jnp.int32)
        ours = np.asarray(
            _process_scores(jnp.asarray(scores), cfg, hist,
                            jnp.int32(cur_len), jnp.int32(cur_len))
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-6)
        assert fires == bool(np.any(ours != scores))


def test_remove_invalid_values_unit_parity():
    from transformers.generation.logits_process import InfNanRemoveLogitsProcessor

    from eilev_tpu.generation.decoding import _process_scores

    scores = np.array(
        [[1.0, np.nan, np.inf, -np.inf, -2.0], [np.nan, 0.5, -np.inf, 3.0, np.inf]],
        np.float32,
    )
    ref = InfNanRemoveLogitsProcessor()(
        torch.zeros((2, 1), dtype=torch.long), torch.tensor(scores)
    ).numpy()
    cfg = GenerationConfig(remove_invalid_values=True, pad_token_id=0)
    ours = np.asarray(
        _process_scores(jnp.asarray(scores), cfg, jnp.zeros((2, 4), jnp.int32),
                        jnp.int32(1), jnp.int32(1))
    )
    np.testing.assert_array_equal(ours, ref)


def test_renormalize_logits_beam(opt_setup):
    """LogitNormalization only changes outcomes where scores accumulate (beam
    search); verified token-identical vs HF with a processor upstream that
    de-normalizes the scores."""
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    pad = cfg.text_config.pad_token_id
    kwargs = dict(repetition_penalty=1.6, renormalize_logits=True)
    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=8, do_sample=False,
        num_beams=3, pad_token_id=pad, **kwargs,
    )
    ours = _ours(m, params, ids, mask, pixel, vim,
                 GenerationConfig(max_new_tokens=8, num_beams=3,
                                  pad_token_id=pad, **kwargs))
    _check(ref, ours)


def test_encoder_repetition_penalty_hf_noop(opt_setup):
    """On the reference's inputs_embeds path HF's own
    EncoderRepetitionPenaltyLogitsProcessor sees EMPTY input_ids and does
    nothing (utils.py:1124-1151); we accept the key, warn, and drop it — and
    must match HF with the knob set."""
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    pad = cfg.text_config.pad_token_id
    ref_with = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=6, do_sample=False,
        encoder_repetition_penalty=2.5,
    )
    ref_without = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=6, do_sample=False,
    )
    np.testing.assert_array_equal(ref_with, ref_without)  # HF no-op, proven
    with pytest.warns(UserWarning, match="encoder_repetition_penalty"):
        gcfg = generation_config_from_json(
            {"max_new_tokens": 6, "encoder_repetition_penalty": 2.5},
            pad_token_id=pad,
        )
    ours = _ours(m, params, ids, mask, pixel, vim, gcfg)
    _check(ref_with, ours)


def test_from_json_round4_keys():
    with pytest.warns(UserWarning, match="encoder_no_repeat_ngram_size"):
        cfg = generation_config_from_json(
            {
                "sequence_bias": [[[3, 4], -2.0], [[5], 1.5]],
                "exponential_decay_length_penalty": [4, 1.2],
                "remove_invalid_values": True,
                "renormalize_logits": True,
                "encoder_no_repeat_ngram_size": 3,
            },
            pad_token_id=1,
        )
    assert cfg.sequence_bias == (((3, 4), -2.0), ((5,), 1.5))
    assert cfg.exponential_decay_length_penalty == (4, 1.2)
    assert cfg.remove_invalid_values and cfg.renormalize_logits
    assert hash(cfg)  # stays hashable (jit static arg)


def test_stream_rejects_processors(opt_setup):
    from eilev_tpu.generation import generate_stream

    _, cfg, params, m, ids, mask, pixel, vim = opt_setup
    with pytest.raises(NotImplementedError, match="repetition_penalty"):
        next(
            iter(
                generate_stream(
                    m,
                    {"params": params},
                    input_ids=jnp.asarray(ids),
                    generation_config=GenerationConfig(
                        max_new_tokens=4, repetition_penalty=1.2
                    ),
                )
            )
        )
    # min_length that still binds after the prompt is subtracted needs the
    # step counter generate() has and streaming lacks
    with pytest.raises(NotImplementedError, match="min_length"):
        next(
            iter(
                generate_stream(
                    m,
                    {"params": params},
                    input_ids=jnp.asarray(ids),
                    pixel_values=jnp.asarray(pixel),
                    video_input_mask=jnp.asarray(vim),
                    generation_config=GenerationConfig(
                        max_new_tokens=4, min_length=ids.shape[1] + 2
                    ),
                )
            )
        )
