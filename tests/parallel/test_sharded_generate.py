"""Distributed batched generation: batch sharded over the 'data' mesh axis must
produce the same tokens as single-device execution (the TPU-native replacement
for the reference's accelerate multi-GPU generation -
generate_narration_texts.py:245-254)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig, generate
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.parallel import make_mesh


import pytest

pytestmark = pytest.mark.slow  # heavy equivalence/integration chain


def test_data_sharded_generate_matches_replicated():
    cfg = configs.tiny_config(text_model="opt")
    model = VideoBlipForConditionalGeneration(cfg)
    rng = np.random.default_rng(0)
    b, videos_per, t, s = 8, 1, 2, 16
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(b * videos_per, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    vim = np.zeros((b, s), np.int64)
    vim[:, 1 : 1 + cfg.num_query_tokens] = 1

    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
    )["params"]

    gen_cfg = GenerationConfig(max_new_tokens=5, pad_token_id=1)

    ref = np.asarray(
        generate(
            model,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=gen_cfg,
        )
    )

    mesh = make_mesh(data=8, model=1)
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    sharded = np.asarray(
        generate(
            model,
            jax.device_put({"params": params}, rep),
            input_ids=jax.device_put(jnp.asarray(ids), dp),
            attention_mask=jax.device_put(jnp.asarray(mask), dp),
            pixel_values=jax.device_put(jnp.asarray(pixel), dp),
            video_input_mask=jax.device_put(jnp.asarray(vim), dp),
            generation_config=gen_cfg,
        )
    )
    np.testing.assert_array_equal(ref, sharded)
