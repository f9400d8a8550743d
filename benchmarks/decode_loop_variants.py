#!/usr/bin/env python
"""while_loop(early-exit) vs fixed-length scan for the real decode loop.

The production loop is a lax.while_loop so fully-finished batches exit early
(a ~50x saving on the reference's 512-token budget). But each while iteration
evaluates the cond (an all-reduce over `finished`) and XLA cannot overlap
across iterations the way it can inside a scan. This measures the real
model's 32-step decode both ways at flagship geometry.
"""

import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig
from eilev_tpu.generation.decoding import (
    _greedy_sample_decoder_only,
    _is_eos,
    _prefill,
    _select_token,
)
from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration as VB
from bench import build_prompt, random_bf16_params, SHOTS, FRAMES, MAX_NEW_TOKENS

REPS = int(os.environ.get("REPS", "3"))


def scan_decode(model, variables, inputs_embeds, attention_mask, gen_cfg, rng):
    b = inputs_embeds.shape[0]
    max_new = gen_cfg.max_new_tokens
    last_logits, cache = _prefill(model, variables, inputs_embeds, attention_mask, max_new)

    def body(carry, _):
        cache, logits, finished, cur_rng = carry
        cur_rng, step_rng = jax.random.split(cur_rng)
        tok = _select_token(logits, gen_cfg, step_rng)
        tok = jnp.where(finished, gen_cfg.pad_token_id, tok)
        new_finished = finished | _is_eos(tok, gen_cfg)
        embeds = model.apply(variables, tok[:, None], method=VB.lm_embed)
        next_logits, cache = model.apply(
            variables, embeds, attention_mask=jnp.ones((b, 1), jnp.int32),
            cache=cache, method=VB.lm_forward,
        )
        return (cache, next_logits[:, -1], new_finished, cur_rng), tok

    (_, _, _, _), toks = jax.lax.scan(
        body, (cache, last_logits, jnp.zeros((b,), bool), rng), None, length=max_new
    )
    return toks.T


def main():
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    cfg = configs.blip2_opt_2_7b()
    model = VB(cfg, dtype=jnp.bfloat16)
    v = batch * (SHOTS + 1)
    ids, mask, vim = build_prompt(cfg, batch)
    example = {
        "input_ids": jax.ShapeDtypeStruct(ids.shape, jnp.int32),
        "pixel_values": jax.ShapeDtypeStruct((v, 3, FRAMES, 224, 224), jnp.bfloat16),
        "video_input_mask": jax.ShapeDtypeStruct(vim.shape, jnp.int32),
    }
    params = random_bf16_params(model, example)
    variables = {"params": params}
    # no-eos config: both loops run all 32 steps, isolating loop overhead
    gen_cfg = GenerationConfig(max_new_tokens=MAX_NEW_TOKENS, pad_token_id=1,
                               eos_token_id=(cfg.text_config.vocab_size + 5,))
    rng = jax.random.PRNGKey(0)

    @jax.jit
    def embeds_fn(variables):
        e = model.apply(variables, jnp.asarray(ids, jnp.int32), None, None,
                        method=VB.embed_and_scatter)
        return e

    embeds = embeds_fn(variables)
    mask_d = jnp.asarray(mask, jnp.int32)

    # time prefill alone so the per-step number can EXCLUDE it (round-2 PERF.md
    # quoted ms_per_step_incl_prefill as the decode step — a 4.4 ms/step
    # overstatement at the flagship shape; the real decode step is ~10 ms)
    prefill_fn = jax.jit(
        lambda va, e: jnp.sum(_prefill(model, va, e, mask_d, gen_cfg.max_new_tokens)[0])
    )
    float(prefill_fn(variables, embeds))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(prefill_fn(variables, embeds))
        ts.append(time.perf_counter() - t0)
    prefill_sec = float(np.median(ts))
    print(json.dumps({"loop": "prefill only", "sec": round(prefill_sec, 4)}), flush=True)

    runs = {
        "while_loop (early-exit machinery)": jax.jit(
            lambda va, e: jnp.sum(_greedy_sample_decoder_only(model, va, e, mask_d, gen_cfg, rng))
        ),
        "fixed scan": jax.jit(
            lambda va, e: jnp.sum(scan_decode(model, va, e, mask_d, gen_cfg, rng))
        ),
    }
    for name, fn in runs.items():
        float(fn(variables, embeds))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(fn(variables, embeds))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(json.dumps({
            "loop": name, "sec": round(med, 4),
            "ms_per_step_incl_prefill": round(1000 * med / MAX_NEW_TOKENS, 2),
            "ms_per_decode_step": round(1000 * (med - prefill_sec) / MAX_NEW_TOKENS, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
