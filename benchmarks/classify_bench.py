#!/usr/bin/env python
"""ICL classification (icl_eval workload) throughput across serving modes.

One eval datapoint costs TWO classify calls at the flagship geometry
(reference icl_eval.py:239-313): verb stage (188 classes) then noun stage
(793 classes), each scoring class continuations against the shared 16-shot
prompt cache (~766 tokens, 68 videos). The vision tower is shared across
both stages (and across datapoints via --vision_cache), so this bench
precomputes video features and measures the LM-side cost the serving modes
actually change: prompt prefill + shared-prefix class scoring.

Legs: bf16 / int8_lm / int8_lm+int8_kv (round 4: score_with_prefix reads
int8 prompt caches) / +w8a8_prefill. Prints one JSON line per leg.

Env: BENCH_BATCH (datapoints per program, default 4), CLASS_BATCH (class
chunk, default 128), REPS (default 3).
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
VERB_CLASSES = 188
NOUN_CLASSES = 793
CLASS_LEN = 6  # ~"The camera wearer <verb-phrase>" continuation tokens


def main() -> None:
    import dataclasses

    from bench import FRAMES, SHOTS, build_prompt, random_bf16_params
    from eilev_tpu import configs
    from eilev_tpu.generation import classify
    from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration as VB
    from eilev_tpu.ops.quantization import quantize_lm_params

    batch = int(os.environ.get("BENCH_BATCH", "4"))
    class_batch = int(os.environ.get("CLASS_BATCH", "128"))
    cfg = configs.blip2_opt_2_7b()
    model = VB(cfg, dtype=jnp.bfloat16)
    ids, mask, vim = build_prompt(cfg, batch)
    v = batch * (SHOTS + 1)
    img = cfg.vision_config.image_size
    example = {
        "input_ids": jax.ShapeDtypeStruct(ids.shape, jnp.int32),
        "pixel_values": jax.ShapeDtypeStruct((v, 3, FRAMES, img, img), jnp.bfloat16),
        "video_input_mask": jax.ShapeDtypeStruct(vim.shape, jnp.int32),
    }
    params = random_bf16_params(model, example)

    # precompute the per-video features ONCE (what IclEvaluator/--vision_cache
    # give the classify calls); the LM side is what the legs change
    rng = np.random.default_rng(0)
    feats = jax.jit(
        lambda k: jax.random.normal(
            k, (v * cfg.num_query_tokens, cfg.text_config.hidden_size), jnp.bfloat16
        ) * 0.02
    )(jax.random.PRNGKey(1))
    ids_d = jnp.asarray(ids, jnp.int32)
    mask_d = jnp.asarray(mask, jnp.int32)
    vim_d = jnp.asarray(vim, jnp.int32)
    verb_ids = jnp.asarray(
        rng.integers(1000, 40000, size=(VERB_CLASSES, CLASS_LEN)), jnp.int32
    )
    noun_ids = jnp.asarray(
        rng.integers(1000, 40000, size=(NOUN_CLASSES, CLASS_LEN)), jnp.int32
    )

    def run_leg(name, int8_lm=False, int8_kv=False, w8a8=False):
        tcfg = dataclasses.replace(
            cfg.text_config,
            quantize_matmuls=int8_lm,
            int8_kv_cache=int8_kv,
            w8a8_prefill=w8a8,
        )
        leg_cfg = configs.replace(cfg, text_config=tcfg)
        leg_model = VB(leg_cfg, dtype=jnp.bfloat16)
        if int8_lm:
            qp = dict(params)
            qp["language_model"] = jax.jit(quantize_lm_params)(params["language_model"])
            variables = {"params": qp}
        else:
            variables = {"params": params}

        def datapoint():
            # verb then noun stage against the SAME prompt (the CLI re-prefills
            # per stage because the noun prompt embeds the predicted verb)
            outs = []
            for class_ids in (verb_ids, noun_ids):
                outs.append(
                    classify(
                        leg_model, variables,
                        prompt_input_ids=ids_d,
                        prompt_attention_mask=mask_d,
                        prompt_video_input_mask=vim_d,
                        class_input_ids=class_ids,
                        class_batch_size=class_batch,
                        video_features=feats,
                    )
                )
            return outs

        outs = datapoint()
        _ = [float(np.asarray(o).sum()) for o in outs]  # compile + block
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            outs = datapoint()
            _ = [float(np.asarray(o).sum()) for o in outs]
            ts.append(time.perf_counter() - t0)
        sec = float(np.median(ts))
        print(json.dumps({
            "leg": name, "batch": batch, "class_batch": class_batch,
            "sec_per_program": round(sec, 3),
            "datapoints_per_sec": round(batch / sec, 3),
            "classes_scored": VERB_CLASSES + NOUN_CLASSES,
        }), flush=True)
        del variables
        return sec

    base = run_leg("bf16")
    for name, kw in (
        ("int8_lm", dict(int8_lm=True)),
        ("int8_lm+int8_kv", dict(int8_lm=True, int8_kv=True)),
        ("int8_lm+int8_kv+w8a8_prefill", dict(int8_lm=True, int8_kv=True, w8a8=True)),
    ):
        sec = run_leg(name, **kw)
        print(json.dumps({"leg": name, "speedup_vs_bf16": round(base / sec, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
