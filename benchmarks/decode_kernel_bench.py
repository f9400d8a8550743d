#!/usr/bin/env python
"""Real-model decode-step timing: XLA attention vs the Pallas stacked-cache
kernel (bf16 and int8-KV), prefill-subtracted.

Round-3 measurement fix: earlier numbers (14.4 ms/step) INCLUDED prefill;
the real decode step is ~10 ms. This times the 32-step loop minus a separately
timed prefill, for:
  - bf16 cache, XLA batched-gemv attention (default parity path)
  - bf16 cache, Pallas decode kernel (EILEV_BF16_DECODE_KERNEL=1 candidate)
  - int8 cache via the VMEM-dequant kernel (serving mode; halves cache bytes)
Run with BENCH_BATCH=8 to see the serving operating point where the cache
stream doubles and the kernel matters most.
"""

import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPS = int(os.environ.get("REPS", "3"))


def main():
    import dataclasses

    from eilev_tpu import configs
    from eilev_tpu.generation import GenerationConfig
    from eilev_tpu.generation.decoding import _greedy_sample_decoder_only, _prefill
    from eilev_tpu.models import opt as opt_mod
    from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration as VB
    from bench import build_prompt, random_bf16_params, SHOTS, FRAMES, MAX_NEW_TOKENS

    batch = int(os.environ.get("BENCH_BATCH", "4"))
    base_cfg = configs.blip2_opt_2_7b()
    ids, mask, vim = build_prompt(base_cfg, batch)
    mask_d = jnp.asarray(mask, jnp.int32)
    gen_cfg = GenerationConfig(
        max_new_tokens=MAX_NEW_TOKENS, pad_token_id=1,
        eos_token_id=(base_cfg.text_config.vocab_size + 5,),  # never fires
    )
    rng = jax.random.PRNGKey(0)

    def measure(name, cfg):
        # two VB instances with equal config hash equal -> the jit cache would
        # silently reuse the previous variant's compiled program
        jax.clear_caches()
        model = VB(cfg, dtype=jnp.bfloat16)
        v = batch * (SHOTS + 1)
        example = {
            "input_ids": jax.ShapeDtypeStruct(ids.shape, jnp.int32),
            "pixel_values": jax.ShapeDtypeStruct((v, 3, FRAMES, 224, 224), jnp.bfloat16),
            "video_input_mask": jax.ShapeDtypeStruct(vim.shape, jnp.int32),
        }
        params = random_bf16_params(model, example)
        variables = {"params": params}
        embeds = jax.jit(
            lambda va: model.apply(va, jnp.asarray(ids, jnp.int32), None, None,
                                   method=VB.embed_and_scatter)
        )(variables)

        prefill_fn = jax.jit(
            lambda va, e: jnp.sum(_prefill(model, va, e, mask_d, gen_cfg.max_new_tokens)[0])
        )
        full_fn = jax.jit(
            lambda va, e: jnp.sum(
                _greedy_sample_decoder_only(model, va, e, mask_d, gen_cfg, rng)
            )
        )

        def med(fn):
            float(fn(variables, embeds))
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(fn(variables, embeds))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        pre = med(prefill_fn)
        full = med(full_fn)
        print(json.dumps({
            "variant": name, "batch": batch,
            "prefill_sec": round(pre, 4), "full_sec": round(full, 4),
            "ms_per_decode_step": round(1000 * (full - pre) / MAX_NEW_TOKENS, 2),
        }), flush=True)
        del params, variables, embeds
        import gc; gc.collect()

    measure("bf16 cache, XLA attention", base_cfg)

    import eilev_tpu.models.opt as om
    om._BF16_DECODE_KERNEL = True
    measure("bf16 cache, Pallas decode kernel", base_cfg)
    om._BF16_DECODE_KERNEL = False

    int8_cfg = configs.replace(
        base_cfg,
        text_config=dataclasses.replace(base_cfg.text_config, int8_kv_cache=True),
    )
    measure("int8 cache, Pallas VMEM-dequant kernel", int8_cfg)


if __name__ == "__main__":
    main()
