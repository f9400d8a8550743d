"""Training-step throughput at flagship geometry (the reference's train_v2
recipe: blip2-opt-2.7b, 16-shot interleaved prompts, frozen ViT+LM, trainable
Q-Former — /root/reference/README.md:135-165, global batch 128 as micro 1 x
accum 16 x 8 GPUs because "the interleaved samples are too big for larger
micro-batches on A40", SURVEY.md section 3.1).

Measures one optimizer step (forward + backward-through-frozen-LM + AdamW) at
several micro-batch sizes, with and without per-layer remat of the LM trunk
(configs.OPTConfig.remat). Remat stores only the (B, S, H) layer boundaries
and recomputes attention/MLP internals in backward — the lever that lifts the
activation-memory wall pinning the reference to micro-batch 1.

Env:
  TRAIN_BENCH_VARIANTS  comma list of `<micro>[r]` entries, default
                        "1,1r,2r,4r" (r = remat). bf16 compute, fp32 master
                        trainable params, dropout active (the recipe's).
  TRAIN_BENCH_SEQ       token bucket, default 1024 (the train CLI's
                        --max_length static bucket).
  TRAIN_BENCH_STEPS     timed steps per variant, default 3.

Prints one JSON line per variant:
  {"variant": "4r", "micro": 4, "remat": true, "s_per_step": ...,
   "datapoints_per_sec": ..., "videos_per_sec": ..., "peak_bytes": ...}
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import SHOTS, build_prompt, random_bf16_params
from eilev_tpu import configs
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.training import (
    OptimizerConfig,
    TrainState,
    make_optimizer,
    make_train_step,
    partition_params,
)

FRAMES = 8


def make_batch(cfg, micro: int, seq: int):
    ids, mask, vim = build_prompt(cfg, micro)
    pad = seq - ids.shape[1]
    assert pad >= 0, f"TRAIN_BENCH_SEQ={seq} < prompt {ids.shape[1]}"
    ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=1)
    mask = np.pad(mask, ((0, 0), (0, pad)))
    vim = np.pad(vim, ((0, 0), (0, pad)))
    labels = np.where((vim == 1) | (mask == 0), -100, ids)
    v = micro * (SHOTS + 1)
    rng = np.random.default_rng(2)
    pixel = (rng.normal(size=(v, 3, FRAMES, 224, 224)) * 0.5).astype(jnp.bfloat16)

    def lead(x):  # accum axis of 1: one microbatch per optimizer step
        return jnp.asarray(x)[None]

    return {
        "input_ids": lead(ids.astype(np.int32)),
        "attention_mask": lead(mask.astype(np.int32)),
        "labels": lead(labels.astype(np.int32)),
        "video_input_mask": lead(vim.astype(np.int32)),
        "pixel_values": lead(pixel),
    }


def run_variant(micro: int, remat: bool, seq: int, steps: int) -> dict:
    cfg = configs.blip2_opt_2_7b()
    if remat:
        cfg = configs.replace(
            cfg, text_config=dataclasses.replace(cfg.text_config, remat=True)
        )
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.bfloat16)
    batch = make_batch(cfg, micro, seq)

    example = {
        "input_ids": batch["input_ids"][0],
        "pixel_values": batch["pixel_values"][0],
        "video_input_mask": batch["video_input_mask"][0],
    }
    params = random_bf16_params(model, example)
    trainable, frozen = partition_params(params)
    # fp32 master weights for the trainable subtree (the product recipe)
    trainable = jax.tree.map(lambda x: x.astype(jnp.float32), trainable)
    tx = make_optimizer(OptimizerConfig())
    state = TrainState.create(trainable, tx)

    step = jax.jit(make_train_step(model, accum_steps=1, dropout=True), donate_argnums=(0,))
    state, metrics = step(state, frozen, batch)  # compile + warmup
    # host readback forces real completion (this tunnel's block_until_ready
    # does not actually wait — same convention as bench.py)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, frozen, batch)
    loss = float(metrics["loss"])
    s_per_step = (time.perf_counter() - t0) / steps

    stats = jax.local_devices()[0].memory_stats() or {}
    videos = micro * (SHOTS + 1)
    return {
        "variant": f"{micro}{'r' if remat else ''}",
        "micro": micro,
        "remat": remat,
        "seq": seq,
        "s_per_step": round(s_per_step, 4),
        "datapoints_per_sec": round(micro / s_per_step, 3),
        "videos_per_sec": round(videos / s_per_step, 2),
        "loss": loss,
        "peak_bytes": int(stats.get("peak_bytes_in_use", 0)),
    }


def main() -> None:
    seq = int(os.environ.get("TRAIN_BENCH_SEQ", "1024"))
    steps = int(os.environ.get("TRAIN_BENCH_STEPS", "3"))
    variants = os.environ.get("TRAIN_BENCH_VARIANTS", "1,1r,2r,4r").split(",")
    for v in variants:
        v = v.strip()
        if not v:
            continue
        remat = v.endswith("r")
        micro = int(v[:-1] if remat else v)
        try:
            out = run_variant(micro, remat, seq, steps)
        except Exception as e:  # OOM at large micro without remat is a result
            out = {
                "variant": v,
                "micro": micro,
                "remat": remat,
                "seq": seq,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
