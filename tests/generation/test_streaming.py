"""Streaming generation: chunked yields are token-identical to generate()."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig, generate, generate_stream
from eilev_tpu.models import VideoBlipForConditionalGeneration


def _setup():
    cfg = configs.tiny_config(text_model="opt")
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    b, t, s = 2, 2, 14
    img = cfg.vision_config.image_size
    pixel = jnp.asarray(rng.normal(size=(b, 3, t, img, img)), jnp.float32)
    ids = jnp.asarray(rng.integers(4, cfg.text_config.vocab_size, size=(b, s)), jnp.int32)
    vim = np.zeros((b, s), np.int32)
    vim[:, 1 : 1 + cfg.num_query_tokens] = 1
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=ids,
        pixel_values=pixel,
        video_input_mask=jnp.asarray(vim),
    )["params"]
    return cfg, model, {"params": params}, ids, pixel, jnp.asarray(vim)


@pytest.mark.parametrize("chunk", [1, 3, 4])
def test_stream_matches_generate_greedy(chunk):
    cfg, model, variables, ids, pixel, vim = _setup()
    gen_cfg = GenerationConfig(max_new_tokens=10, pad_token_id=1)
    ref = np.asarray(
        generate(
            model, variables, input_ids=ids, pixel_values=pixel,
            video_input_mask=vim, generation_config=gen_cfg,
        )
    )
    chunks = list(
        generate_stream(
            model, variables, input_ids=ids, pixel_values=pixel,
            video_input_mask=vim, generation_config=gen_cfg, chunk_tokens=chunk,
        )
    )
    streamed = np.concatenate(chunks, axis=1)
    n = streamed.shape[1]
    assert n >= min(10, ref.shape[1])
    np.testing.assert_array_equal(streamed[:, : ref.shape[1]], ref[:, :n][:, : streamed.shape[1]])


@pytest.mark.slow
def test_stream_matches_generate_sampling():
    cfg, model, variables, ids, pixel, vim = _setup()
    gen_cfg = GenerationConfig(
        max_new_tokens=8, pad_token_id=1, do_sample=True, temperature=0.9, top_k=8
    )
    key = jax.random.PRNGKey(7)
    ref = np.asarray(
        generate(
            model, variables, input_ids=ids, pixel_values=pixel,
            video_input_mask=vim, generation_config=gen_cfg, rng=key,
        )
    )
    streamed = np.concatenate(
        list(
            generate_stream(
                model, variables, input_ids=ids, pixel_values=pixel,
                video_input_mask=vim, generation_config=gen_cfg, rng=key,
                chunk_tokens=3,
            )
        ),
        axis=1,
    )
    n = min(streamed.shape[1], ref.shape[1])
    np.testing.assert_array_equal(streamed[:, :n], ref[:, :n])


def test_stream_rejects_beam():
    cfg, model, variables, ids, pixel, vim = _setup()
    with pytest.raises(NotImplementedError):
        next(
            generate_stream(
                model, variables, input_ids=ids, pixel_values=pixel,
                video_input_mask=vim,
                generation_config=GenerationConfig(num_beams=5, pad_token_id=1),
            )
        )
