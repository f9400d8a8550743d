#!/usr/bin/env python
"""Prompt-lookup speculative decoding, measured at the flagship shape.

Three legs at the real 2.7B/16-shot decode geometry (vision skipped — the
lever is the decode phase):

  greedy    plain 32-token greedy decode (the baseline every leg must match)
  pld_echo  lookup corpus seeded with the row's own greedy output — the
            alpha ~ 1 operating point. This is the honest stand-in for the
            16-shot narration workload (generated narrations echo in-context
            example narrations) that random weights cannot reproduce: the
            corpus mechanism, verify pass, rollback and emission logic all
            run exactly as in production; only the match quality is idealized.
  pld_cold  random garbage corpus — alpha ~ 0, the overhead bound (every
            verify pass emits exactly 1 token).

Each leg checks token-identity against the greedy output before timing.
Reported: wall s / accepted tokens per verify pass / effective ms per token.

Env: BENCH_BATCH (default 1 — the reference's own 16-shot generation protocol
runs batch 1 per device, slurm-scripts/README.md:71-76; batched PLD advances
by the MIN acceptance over rows), GAMMA (default 8), MATCH_LEN (default 3),
REPS (default 3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = int(os.environ.get("REPS", "3"))
GAMMA = int(os.environ.get("GAMMA", "8"))
MATCH_LEN = int(os.environ.get("MATCH_LEN", "3"))
MAX_NEW = 32


def main() -> None:
    from bench import FRAMES, SHOTS, build_prompt, random_bf16_params
    from eilev_tpu import configs
    from eilev_tpu.generation import GenerationConfig
    from eilev_tpu.generation.decoding import _greedy_sample_decoder_only
    from eilev_tpu.generation.speculative import (
        build_lookup_corpus,
        prompt_lookup_greedy_decode,
    )
    from eilev_tpu.models.opt import OPTForCausalLM
    from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration as VB

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    cfg = configs.blip2_opt_2_7b()
    tcfg = cfg.text_config
    model = VB(cfg, dtype=jnp.bfloat16)
    ids, mask, vim = build_prompt(cfg, batch)
    v = batch * (SHOTS + 1)
    example = {
        "input_ids": jax.ShapeDtypeStruct(ids.shape, jnp.int32),
        "pixel_values": jax.ShapeDtypeStruct((v, 3, FRAMES, 224, 224), jnp.bfloat16),
        "video_input_mask": jax.ShapeDtypeStruct(vim.shape, jnp.int32),
    }
    params = random_bf16_params(model, example)
    lm_params = params["language_model"]
    target = OPTForCausalLM(tcfg, dtype=jnp.bfloat16)

    # decode-focused: prompt embeds without the vision tower (same trick as
    # speculative_bench.py — the token-embedding prompt exercises the same
    # decode cost; vision features only change WHICH tokens come out)
    embeds = jax.jit(
        lambda p: model.apply(
            {"params": p}, jnp.asarray(ids, jnp.int32), method=VB.lm_embed
        )
    )(params)
    mask_d = jnp.asarray(mask, jnp.int32)
    gen_cfg = GenerationConfig(
        max_new_tokens=MAX_NEW, pad_token_id=1, eos_token_id=(50118,)
    )
    rng = jax.random.PRNGKey(0)

    def timed(fn):
        out = np.asarray(fn())  # compile + warmup
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(fn())
            ts.append(time.perf_counter() - t0)
        return out, float(np.median(ts))

    # ---- leg 1: plain greedy --------------------------------------------
    greedy_out, t_greedy = timed(
        lambda: _greedy_sample_decoder_only(model, {"params": params}, embeds, mask_d, gen_cfg, rng)
    )
    print(json.dumps({
        "leg": "greedy", "batch": batch, "wall_s": round(t_greedy, 4),
        "ms_per_token": round(1000 * t_greedy / MAX_NEW, 2),
    }), flush=True)

    prompt_corpus = build_lookup_corpus(
        jnp.asarray(ids, jnp.int32), jnp.asarray(mask), jnp.asarray(vim)
    )

    def run_pld(corpus, leg):
        def fn():
            out, (n_tok, iters) = prompt_lookup_greedy_decode(
                target, lm_params, corpus, embeds, mask_d, gen_cfg,
                gamma=GAMMA, match_len=MATCH_LEN, return_stats=True,
            )
            return out
        out, t = timed(fn)
        np.testing.assert_array_equal(out, greedy_out)  # token identity, on-chip
        _, (n_tok, iters) = prompt_lookup_greedy_decode(
            target, lm_params, corpus, embeds, mask_d, gen_cfg,
            gamma=GAMMA, match_len=MATCH_LEN, return_stats=True,
        )
        n_tok, iters = int(n_tok), int(iters)
        print(json.dumps({
            "leg": leg, "batch": batch, "gamma": GAMMA, "match_len": MATCH_LEN,
            "wall_s": round(t, 4),
            "tokens_per_pass": round(n_tok / max(iters, 1), 2),
            "ms_per_token": round(1000 * t / MAX_NEW, 2),
            "speedup_vs_greedy": round(t_greedy / t, 2),
            "token_identical": True,
        }), flush=True)

    # ---- leg 2: echo corpus (alpha ~ 1) ----------------------------------
    echo = jnp.concatenate(
        [prompt_corpus, jnp.asarray(greedy_out, jnp.int32)], axis=1
    )
    run_pld(echo, "pld_echo")

    # ---- leg 3: garbage corpus (alpha ~ 0 overhead bound) ----------------
    garbage = jnp.asarray(
        np.random.default_rng(3).integers(1000, 40000, size=ids.shape), jnp.int32
    )
    run_pld(garbage, "pld_cold")


if __name__ == "__main__":
    main()
