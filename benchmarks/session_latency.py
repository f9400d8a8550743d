"""Multi-turn chat latency: incremental KV reuse vs reference-style rebuild.

The reference demo re-prefills the FULL conversation every turn
(/root/reference/demo/eilev_demo.py:52-67): every earlier video re-encodes
through the ViT and every earlier token re-prefills. serving/session.py keeps
the session cache alive and prefills only each turn's delta. This benchmark
measures both modes per turn at the flagship blip2-opt-2.7b geometry on one
chip, for a conversation shaped like the demo workload:

  turn 1: 8 videos + text   (the expensive context-setting turn)
  turn 2: text only
  turn 3: +1 video + text
  turn 4: text only

Each conversation runs twice with identical shapes; the second (compile-warm)
run is reported. Reported per turn: full-turn latency (32 new tokens) and
TTFT (max_new=1). Usage: python benchmarks/session_latency.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig, generate
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.serving import ChatSession

FRAMES = 8
Q_NEWLINE = 50118
# (new videos, new text tokens) per turn. Default keeps the compile budget
# small on a slow-compile host (each distinct prompt length costs a fresh
# 2.7B XLA compile in rebuild mode); SESSION_LONG=1 adds a +1-video turn
# and a fourth text turn.
SCRIPT = [(8, 24), (0, 12)]
if os.environ.get("SESSION_LONG"):
    SCRIPT += [(1, 16), (0, 12)]


def turn_tokens(rng, cfg, n_videos, n_text):
    q = cfg.num_query_tokens
    ids, vim = [], []
    for _ in range(n_videos):
        ids += [1] * q + [Q_NEWLINE]
        vim += [1] * q + [0]
    ids += rng.integers(1000, 40000, size=n_text).tolist()
    vim += [0] * n_text
    return ids, vim


def run_conversation(mode, model, variables, cfg, gen_cfg, make_videos):
    """One full scripted conversation; returns per-turn wall seconds."""
    rng = np.random.default_rng(7)
    sess = ChatSession(model, variables, gen_cfg, max_len=2048, bucket=64)
    ids, vim = [2], [0]
    videos = None
    times = []
    for t, (nv, nt) in enumerate(SCRIPT):
        d_ids, d_vim = turn_tokens(rng, cfg, nv, nt)
        ids += d_ids
        vim += d_vim
        if nv:
            new = make_videos(nv, 100 + t)
            videos = new if videos is None else jnp.concatenate([videos, new])
        a_ids, a_vim = np.asarray(ids), np.asarray(vim)
        t0 = time.perf_counter()
        if mode == "reuse":
            reply = sess.turn(a_ids, videos, a_vim)
        else:
            out = generate(
                model, variables,
                input_ids=jnp.asarray(a_ids[None]),
                pixel_values=videos,
                video_input_mask=jnp.asarray(a_vim[None]),
                generation_config=gen_cfg,
            )
            jax.block_until_ready(out)
            reply = np.asarray(out)[0]
            reply = reply[reply != gen_cfg.pad_token_id]
        times.append(time.perf_counter() - t0)
        print(f"    [{mode}] turn {t+1}: {times[-1]:.1f}s", flush=True)
        ids += [int(x) for x in reply]
        vim += [0] * len(reply)
    return times


def main() -> None:
    print("devices:", jax.devices())
    cfg = configs.blip2_opt_2_7b()
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.bfloat16)
    from bench import random_bf16_params  # same flagship init path as bench.py

    img = cfg.vision_config.image_size

    def make_videos(n, seed):
        return jnp.asarray(
            np.random.default_rng(seed).normal(size=(n, 3, FRAMES, img, img)),
            jnp.bfloat16,
        )

    example = {
        "input_ids": jnp.asarray([[2] + [1] * cfg.num_query_tokens], jnp.int32),
        "pixel_values": make_videos(1, 0),
        "video_input_mask": jnp.asarray([[0] + [1] * cfg.num_query_tokens], jnp.int32),
    }
    variables = {"params": random_bf16_params(model, example)}

    labels = [(32, "full turn (32 tokens)")]
    if os.environ.get("SESSION_TTFT"):  # opt-in: doubles the compile budget
        labels.insert(0, (1, "TTFT (max_new=1)"))
    print("params ready", flush=True)
    for max_new, label in labels:
        gen_cfg = GenerationConfig(max_new_tokens=max_new, pad_token_id=1)
        print(f"\n== {label} ==")
        for mode in ("rebuild", "reuse"):
            run_conversation(mode, model, variables, cfg, gen_cfg, make_videos)  # warm
            times = run_conversation(mode, model, variables, cfg, gen_cfg, make_videos)
            print(f"  {mode:8s}: " + "  ".join(
                f"t{i+1}={ms*1000:7.1f}ms" for i, ms in enumerate(times)))


if __name__ == "__main__":
    main()
