"""Serving-mode guards: bf16 generation sanity + early-exit decode actually
terminates at eos instead of running the full token budget."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig, generate
from eilev_tpu.models import VideoBlipForConditionalGeneration


def _setup(dtype):
    cfg = configs.tiny_config(text_model="opt")
    model = VideoBlipForConditionalGeneration(cfg, dtype=dtype)
    rng = np.random.default_rng(0)
    b, t, s = 2, 2, 14
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(b, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, s))
    vim = np.zeros((b, s), np.int64)
    vim[:, 1 : 1 + cfg.num_query_tokens] = 1
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
    )["params"]
    return cfg, model, params, ids, pixel, vim


@pytest.mark.slow
def test_bf16_generation_runs_and_is_valid():
    """bf16 serving config: same shapes, valid tokens, deterministic."""
    cfg, model, params, ids, pixel, vim = _setup(jnp.bfloat16)
    bf16_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    gen_cfg = GenerationConfig(max_new_tokens=6, pad_token_id=1)
    outs = [
        np.asarray(
            generate(
                model,
                {"params": bf16_params},
                input_ids=jnp.asarray(ids),
                pixel_values=jnp.asarray(pixel, jnp.bfloat16),
                video_input_mask=jnp.asarray(vim),
                generation_config=gen_cfg,
            )
        )
        for _ in range(2)
    ]
    assert outs[0].shape == (2, 6)
    assert (outs[0] >= 0).all() and (outs[0] < cfg.text_config.vocab_size).all()
    np.testing.assert_array_equal(outs[0], outs[1])  # deterministic


@pytest.mark.slow
def test_early_exit_saves_decode_steps():
    """With an eos that greedy emits immediately, a 1024-token budget must
    not cost ~1024 steps (the while_loop exits when all rows finish)."""
    cfg, model, params, ids, pixel, vim = _setup(jnp.float32)
    v = {"params": params}

    # find what greedy emits first, use it as eos
    probe = np.asarray(
        generate(
            model, v,
            input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=GenerationConfig(max_new_tokens=2, pad_token_id=1),
        )
    )
    eos = tuple(int(x) for x in set(probe[:, 0]))

    def run(gcfg):
        out = generate(
            model, v,
            input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim), generation_config=gcfg,
        )
        return np.asarray(out)

    fast_cfg = GenerationConfig(max_new_tokens=1024, pad_token_id=1, eos_token_id=eos)
    # an eos id no token can ever equal -> the full 1024-step budget runs
    slow_cfg = GenerationConfig(
        max_new_tokens=1024, pad_token_id=1,
        eos_token_id=(cfg.text_config.vocab_size + 7,),
    )
    run(fast_cfg)  # compile
    run(slow_cfg)  # compile

    def timed(gcfg):
        # min-of-reps: wall time on a shared 1-vCPU CI host is contaminated by
        # scheduler noise that only ever ADDS time, so min is the right
        # estimator for "what the program costs"
        ts, out = [], None
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(gcfg)
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts)), out

    # the budget-length decode must be slower than the early-exit one. Both
    # pay the same constant encode+prefill cost, which dominates on a slow
    # host (a 1-vCPU CI box measured only 1.26x for 1024-vs-1 steps), so the
    # assertion is ordering-only (the real speed claim is measured on TPU in
    # benchmarks/decode_loop_variants.py) — and even ordering can flip under a
    # noisy-neighbor burst, so allow up to 3 measurement attempts.
    out_fast = None
    for attempt in range(3):
        fast, out_fast = timed(fast_cfg)
        slow, _ = timed(slow_cfg)
        if fast < slow:
            break
    else:
        raise AssertionError((fast, slow))

    # all rows emit eos at step 1 -> everything after is pad
    assert (out_fast[:, 1:] == 1).all()
