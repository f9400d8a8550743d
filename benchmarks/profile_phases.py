#!/usr/bin/env python
"""Phase-level timing of the flagship 16-shot ICL workload on one chip.

Every timed program folds a SCALAR reduction of its output into the jit, so the
forced device->host readback (axon's block_until_ready is a no-op) moves 4
bytes instead of multi-GB activations over the tunnel. Used to drive the
round-2 perf work; results recorded in docs/PERF.md.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import numpy as np
import jax
import jax.numpy as jnp

from eilev_tpu import configs
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration as VB
from eilev_tpu.generation import GenerationConfig
from eilev_tpu.generation.decoding import _greedy_sample_decoder_only, _prefill
from bench import build_prompt, random_bf16_params, SHOTS, FRAMES, MAX_NEW_TOKENS

REPS = int(os.environ.get("REPS", "3"))


def _scalar(x):
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def timeit(name, fn, *args, reps=REPS, flops=None):
    jfn = jax.jit(lambda *a: _scalar(fn(*a)))
    float(jfn(*args))  # compile + run
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    line = {"phase": name, "sec": round(med, 4)}
    if flops:
        line["tflops_per_sec"] = round(flops / med / 1e12, 1)
        line["mfu_pct_197"] = round(100 * flops / med / 1e12 / 197, 1)
    print(json.dumps(line), flush=True)
    return med


def main():
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    cfg = configs.blip2_opt_2_7b()
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.bfloat16)
    v = batch * (SHOTS + 1)
    ids, mask, vim = build_prompt(cfg, batch)
    pixel_u8 = np.random.default_rng(1).integers(0, 256, size=(v, 3, FRAMES, 224, 224), dtype=np.uint8)
    example = {
        "input_ids": jax.ShapeDtypeStruct(ids.shape, jnp.int32),
        "pixel_values": jax.ShapeDtypeStruct((v, 3, FRAMES, 224, 224), jnp.bfloat16),
        "video_input_mask": jax.ShapeDtypeStruct(vim.shape, jnp.int32),
    }
    params = random_bf16_params(model, example)
    variables = {"params": params}
    ids_d, mask_d, vim_d = map(jnp.asarray, (ids, mask, vim))
    print(json.dumps({"phase": "params ready"}), flush=True)

    from eilev_tpu.ops.preprocess import process_videos

    # ---- reference GEMMs (what the MXU can actually do on this chip) ----
    vis = cfg.vision_config
    frames = v * FRAMES
    seq = vis.seq_len  # 257
    d, ffn = vis.hidden_size, vis.intermediate_size
    a = jax.random.normal(jax.random.PRNGKey(0), (frames * seq, d), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (d, ffn), jnp.bfloat16)
    timeit("gemm_flat (139k x 1408 x 6144)", lambda a, w: a @ w, a, w,
           flops=2 * a.shape[0] * d * ffn)

    a3 = a.reshape(frames, seq, d)
    timeit("gemm_batched (544 x 257 x 1408 x 6144)", lambda a, w: a @ w, a3, w,
           flops=2 * frames * seq * d * ffn)

    # attention-shaped batched GEMMs (the ViT attention inner ops)
    nh, hd = vis.num_attention_heads, vis.head_dim  # 16, 88
    qh = jax.random.normal(jax.random.PRNGKey(2), (frames, seq, nh, hd), jnp.bfloat16)
    timeit("vit attn QK^T (544,16,257,257,88)",
           lambda q: jnp.einsum("bshd,blhd->bhsl", q, q), qh,
           flops=2 * frames * nh * seq * seq * hd)

    # ---- pipeline phases ----
    pixel_d = jnp.asarray(pixel_u8)
    timeit("preprocess (uint8->bf16 544 frames)",
           lambda p: process_videos(p, dtype=jnp.bfloat16), pixel_d)
    pre = jax.jit(lambda p: process_videos(p, dtype=jnp.bfloat16))
    pixel_proc = pre(pixel_d)

    per_frame = vis.num_hidden_layers * (8 * seq * d * d + 4 * seq * d * ffn + 4 * seq * seq * d)
    timeit("vision tower (544 frames, 39L)",
           lambda vr, p: model.apply(vr, p, method=VB.vision_forward),
           variables, pixel_proc, flops=per_frame * frames)

    timeit("vision+qformer+scatter",
           lambda vr, p: model.apply(vr, ids_d, p, vim_d, method=VB.embed_and_scatter),
           variables, pixel_proc)
    emb_fn = jax.jit(lambda vr, p: model.apply(vr, ids_d, p, vim_d, method=VB.embed_and_scatter))
    embeds = emb_fn(variables, pixel_proc)

    s_len = ids.shape[1]
    tcfg = cfg.text_config
    opt_flops = batch * s_len * tcfg.num_hidden_layers * 2 * (
        4 * tcfg.hidden_size**2 + 2 * tcfg.hidden_size * tcfg.ffn_dim
    ) + batch * s_len * 2 * tcfg.hidden_size * tcfg.vocab_size
    timeit(f"opt prefill (B={batch}, S={s_len})",
           lambda vr, e: _prefill(model, vr, e, mask_d, MAX_NEW_TOKENS),
           variables, embeds, flops=opt_flops)

    gen_cfg = GenerationConfig(max_new_tokens=MAX_NEW_TOKENS, pad_token_id=1, eos_token_id=())
    rng = jax.random.PRNGKey(0)
    t_pref = None
    t_dec = timeit(f"prefill+decode {MAX_NEW_TOKENS} (no eos exit)",
                   lambda vr, e: _greedy_sample_decoder_only(model, vr, e, mask_d, gen_cfg, rng),
                   variables, embeds)
    print(json.dumps({"phase": "decode per-step est", "ms": round(1000 * t_dec / MAX_NEW_TOKENS, 2)}), flush=True)

    t_full = timeit("FULL fused step",
                    lambda vr, p: _greedy_sample_decoder_only(
                        model, vr, model.apply(vr, ids_d, process_videos(p, dtype=jnp.bfloat16),
                                               vim_d, method=VB.embed_and_scatter),
                        mask_d, gen_cfg, rng),
                    variables, pixel_d)
    print(json.dumps({"phase": "serial videos/sec", "v_per_s": round(v / t_full, 2)}), flush=True)


if __name__ == "__main__":
    main()
