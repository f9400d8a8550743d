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
        generation_config_from_json({"penalty_alpha": 0.5}, pad_token_id=1)
    with pytest.raises(ValueError, match="not a recognized.*supported keys"):
        generation_config_from_json({"nonsense_key": 3}, pad_token_id=1)


def test_from_json_num_return_sequences():
    cfg = generation_config_from_json(
        {"num_return_sequences": 3, "do_sample": True}, pad_token_id=1
    )
    assert cfg.num_return_sequences == 3


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
