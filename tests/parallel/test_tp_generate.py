"""Tensor-parallel inference: weights sharded over the 'model' mesh axis must
produce the same tokens/scores as replicated execution.

The reference has no inference-time model sharding (accelerate hf_device_map
pipeline placement is the closest thing - /root/reference/eilev/model/v2.py:276-278);
this is the TPU-native capability that fits weight sets one chip's HBM cannot
hold (e.g. bf16 batch-8 serving, docs/PERF.md). Sharding enters only through
``shard_variables_for_inference`` - the generation/classify jits inherit the
layout via GSPMD propagation, including the head-sharded KV cache.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig, generate
from eilev_tpu.generation.classify import classify
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.parallel import make_mesh, shard_variables_for_inference


pytestmark = pytest.mark.slow  # heavy equivalence/integration chain


def _build(text_model: str):
    cfg = configs.tiny_config(text_model=text_model, hidden=32, heads=4)
    model = VideoBlipForConditionalGeneration(cfg)
    rng = np.random.default_rng(0)
    b, videos_per, t, s = 4, 1, 2, 16
    img = cfg.vision_config.image_size
    pixel = jnp.asarray(
        rng.normal(size=(b * videos_per, 3, t, img, img)).astype(np.float32)
    )
    ids = jnp.asarray(rng.integers(4, cfg.text_config.vocab_size, size=(b, s)))
    mask = jnp.ones((b, s), jnp.int64)
    vim = np.zeros((b, s), np.int64)
    vim[:, 1 : 1 + cfg.num_query_tokens] = 1
    vim = jnp.asarray(vim)
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=ids,
        pixel_values=pixel,
        video_input_mask=vim,
        labels=ids,  # drives the T5 decoder branch at init; OPT ignores shape
    )["params"]
    return model, {"params": params}, dict(
        input_ids=ids, attention_mask=mask, pixel_values=pixel, video_input_mask=vim
    )


@pytest.mark.parametrize(
    "text_model,num_beams", [("opt", 1), ("opt", 3), ("t5", 1)]
)
def test_tp_generate_matches_replicated(text_model, num_beams):
    model, variables, inputs = _build(text_model)
    gen_cfg = GenerationConfig(max_new_tokens=5, num_beams=num_beams, pad_token_id=1)

    ref = np.asarray(generate(model, variables, generation_config=gen_cfg, **inputs))

    # 2-way data x 4-way tensor parallel over the 8 virtual devices
    mesh = make_mesh(data=2, model=4)
    tp_vars = shard_variables_for_inference(variables, mesh)
    dp = NamedSharding(mesh, P("data"))
    tp_inputs = {k: jax.device_put(v, dp) for k, v in inputs.items()}
    out = np.asarray(
        generate(model, tp_vars, generation_config=gen_cfg, **tp_inputs)
    )
    np.testing.assert_array_equal(ref, out)


def test_tp_classify_matches_replicated():
    model, variables, inputs = _build("opt")
    rng = np.random.default_rng(1)
    n_classes, class_len = 6, 3
    class_ids = jnp.asarray(
        rng.integers(4, model.config.text_config.vocab_size, size=(n_classes, class_len))
    )

    kwargs = dict(
        prompt_input_ids=inputs["input_ids"],
        prompt_attention_mask=inputs["attention_mask"],
        pixel_values=inputs["pixel_values"],
        prompt_video_input_mask=inputs["video_input_mask"],
        class_input_ids=class_ids,
    )
    ref = np.asarray(classify(model, variables, **kwargs))

    mesh = make_mesh(data=2, model=4)
    tp_vars = shard_variables_for_inference(variables, mesh)
    dp = NamedSharding(mesh, P("data"))
    tp_kwargs = dict(
        prompt_input_ids=jax.device_put(kwargs["prompt_input_ids"], dp),
        prompt_attention_mask=jax.device_put(kwargs["prompt_attention_mask"], dp),
        pixel_values=jax.device_put(kwargs["pixel_values"], dp),
        prompt_video_input_mask=jax.device_put(kwargs["prompt_video_input_mask"], dp),
        class_input_ids=class_ids,  # classes are shared across the batch: replicated
    )
    out = np.asarray(classify(model, tp_vars, **tp_kwargs))
    np.testing.assert_allclose(ref, out, rtol=2e-5, atol=2e-5)


def test_video_axis_sharded_generate_matches():
    """Single-sample vision sharding over the VIDEO axis (SURVEY §5: scale the
    shot count): pixel_values (V, ...) sharded over 'data' — the ViT and
    Q-Former run video-parallel and GSPMD gathers the 32-token features at
    the scatter. Token-identical to replicated; no code path changes."""
    cfg = configs.tiny_config(text_model="opt")
    model = VideoBlipForConditionalGeneration(cfg)
    rng = np.random.default_rng(3)
    b, videos, t, s_text = 1, 8, 2, 8
    q = cfg.num_query_tokens
    img = cfg.vision_config.image_size
    s = videos * (q + 1) + s_text
    pixel = jnp.asarray(rng.normal(size=(videos, 3, t, img, img)).astype(np.float32))
    ids = np.full((b, s), 1, np.int64)
    vim = np.zeros((b, s), np.int64)
    col = 0
    for _ in range(videos):
        vim[:, col : col + q] = 1
        col += q + 1
    ids[:, -s_text:] = rng.integers(4, cfg.text_config.vocab_size, size=(b, s_text))
    ids, vim = jnp.asarray(ids), jnp.asarray(vim)
    mask = jnp.ones((b, s), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=ids, pixel_values=pixel,
        video_input_mask=vim,
    )["params"]
    gen_cfg = GenerationConfig(max_new_tokens=5, pad_token_id=1)

    ref = np.asarray(
        generate(model, {"params": params}, input_ids=ids, attention_mask=mask,
                 pixel_values=pixel, video_input_mask=vim, generation_config=gen_cfg)
    )

    mesh = make_mesh(data=8, model=1)
    vid_sh = NamedSharding(mesh, P("data"))  # shard the video axis
    rep = NamedSharding(mesh, P())
    out = np.asarray(
        generate(
            model,
            jax.device_put({"params": params}, rep),
            input_ids=jax.device_put(ids, rep),
            attention_mask=jax.device_put(mask, rep),
            pixel_values=jax.device_put(pixel, vid_sh),
            video_input_mask=jax.device_put(vim, rep),
            generation_config=gen_cfg,
        )
    )
    np.testing.assert_array_equal(ref, out)
