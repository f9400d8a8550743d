#!/usr/bin/env python
"""Speculative-decoding cost model, measured at the flagship shape.

No trained draft exists in this environment (bench weights are random, so
realized acceptance is ~0 — the machinery would only LOSE here). What can be
measured honestly is the cost of each ingredient, which fixes the break-even
acceptance rate for any future draft:

  t_step      full-model single decode step
  t_draft(k)  k-layer self-draft single step
  t_verify(g) (g+1)-token cache-append verify pass (same weight stream as one
              step — the whole point)

Effective ms/token = [(g+1) * t_draft + t_verify] / (E[accepted] + 1), where
E[accepted] in [0, g] depends on draft quality. The printed table gives the
alpha (per-token agreement) each configuration needs to beat plain greedy.
"""

import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPS = int(os.environ.get("REPS", "3"))
GAMMA = int(os.environ.get("GAMMA", "4"))
DRAFT_LAYERS = int(os.environ.get("DRAFT_LAYERS", "8"))
STEPS = 32


def main():
    from eilev_tpu import configs
    from eilev_tpu.generation.speculative import make_self_draft
    from eilev_tpu.models import opt as opt_mod
    from eilev_tpu.models.opt import OPTForCausalLM
    from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration as VB
    from bench import build_prompt, random_bf16_params, SHOTS, FRAMES

    batch = int(os.environ.get("BENCH_BATCH", "4"))
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
    draft_model, draft_params = make_self_draft(
        tcfg, lm_params, DRAFT_LAYERS, jnp.bfloat16
    )

    s = ids.shape[1]
    cache_len = s + 2 * STEPS + GAMMA + 2

    def loop_steps(mdl, prm, n_tokens_per_pass):
        """Prefill-subtracted per-pass cost.

        ROUND-4 MEASUREMENT CORRECTION: the round-3 version timed one program
        of [prefill + STEPS passes] and divided by STEPS, silently spreading
        the ~0.14 s prefill over the steps (+4.4 ms/step at batch 4 — the
        exact t_step=14.67 vs ~10.0 ms discrepancy PERF.md flagged). Now the
        same program is timed at STEPS and 2*STEPS and differenced, which
        cancels the prefill exactly: per-pass = (t_2N - t_N) / N.
        """

        def make_run(n_steps):
            @jax.jit
            def run(prm, embeds0, mask0):
                cache = opt_mod.init_cache(mdl.config, batch, cache_len, jnp.bfloat16)
                logits, cache = mdl.apply(
                    {"params": prm}, embeds0, attention_mask=mask0, cache=cache
                )
                tok0 = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

                def body(t, carry):
                    tok, cache, acc = carry
                    block = jnp.broadcast_to(tok[:, None], (batch, n_tokens_per_pass))
                    embeds = mdl.apply({"params": prm}, block, method=OPTForCausalLM.embed)
                    logits, cache = mdl.apply(
                        {"params": prm}, embeds,
                        attention_mask=jnp.ones((batch, n_tokens_per_pass), jnp.int32),
                        cache=cache,
                        cache_append=n_tokens_per_pass > 1,
                    )
                    # roll back so the cache never overflows across iterations
                    cache = dict(cache)
                    cache["index"] = cache["index"] - (n_tokens_per_pass - 1)
                    nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                    return nxt, cache, acc + jnp.sum(logits[:, -1, 0].astype(jnp.float32))

                _, _, acc = jax.lax.fori_loop(0, n_steps, body, (tok0, cache, 0.0))
                return acc

            return run

        embeds0 = jax.jit(
            lambda p: mdl.apply({"params": p}, jnp.asarray(ids, jnp.int32),
                                method=OPTForCausalLM.embed)
        )(prm)
        mask0 = jnp.asarray(mask, jnp.int32)

        def timed(run):
            float(run(prm, embeds0, mask0))  # compile + warmup
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(run(prm, embeds0, mask0))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        t_n = timed(make_run(STEPS))
        t_2n = timed(make_run(2 * STEPS))
        return (t_2n - t_n) / STEPS

    t_step = loop_steps(target, lm_params, 1)
    print(json.dumps({"ingredient": "t_step (full model, 1 token)",
                      "ms": round(1000 * t_step, 2)}), flush=True)
    t_verify = loop_steps(target, lm_params, GAMMA + 1)
    print(json.dumps({"ingredient": f"t_verify (full model, {GAMMA + 1} tokens)",
                      "ms": round(1000 * t_verify, 2)}), flush=True)
    t_draft = loop_steps(draft_model, draft_params, 1)
    print(json.dumps({"ingredient": f"t_draft ({DRAFT_LAYERS}-layer self-draft, 1 token)",
                      "ms": round(1000 * t_draft, 2)}), flush=True)

    iter_cost = (GAMMA + 1) * t_draft + t_verify
    # E[accepted] for per-token agreement alpha: sum_{i=1..g} alpha^i
    rows = []
    for alpha in (0.0, 0.3, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0):
        e_acc = sum(alpha**i for i in range(1, GAMMA + 1))
        ms_per_tok = 1000 * iter_cost / (e_acc + 1)
        rows.append({"alpha": alpha, "ms_per_token": round(ms_per_tok, 2),
                     "speedup_vs_greedy": round(1000 * t_step / ms_per_tok, 2)})
    print(json.dumps({"gamma": GAMMA, "draft_layers": DRAFT_LAYERS,
                      "iter_cost_ms": round(1000 * iter_cost, 2),
                      "greedy_ms_per_token": round(1000 * t_step, 2),
                      "curve": rows}), flush=True)


if __name__ == "__main__":
    main()
