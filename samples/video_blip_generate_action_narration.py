#!/usr/bin/env python
"""Generate an action narration with VideoBLIP v1 (single video + text prompt).

CLI-parity target: /root/reference/samples/video_blip_generate_action_narration.py -
first 10 seconds at 1 fps, sampled decoding (beam 4, temperature 0.7, top_p 0.9,
max_new_tokens 128).
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))
# honor JAX_PLATFORMS even under the axon TPU plugin (which overrides the env var)
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import argparse

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("video")
    p.add_argument("prompt")
    p.add_argument("--model", required=True, help="HF save_pretrained dir (v1 checkpoint)")
    p.add_argument("--processor", default=None)
    p.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from eilev_tpu.generation import GenerationConfig, generate
    from eilev_tpu.models.auto import load_model, load_tokenizer
    from eilev_tpu.native import VideoDecoder
    from eilev_tpu.ops.preprocess import process_videos

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model, variables, config = load_model(args.model, version="v1", dtype=dtype)
    tokenizer = load_tokenizer(args.processor or args.model)

    # first 10 seconds at ~1 fps (reference samples/...py:17-21)
    with VideoDecoder(args.video) as dec:
        end = min(10.0, dec.duration)
        frames = dec.decode_clip(0.0, end, max(int(end), 1))

    img = config.vision_config.image_size
    pixel = process_videos(jnp.asarray(frames[None]), height=img, width=img, dtype=dtype)
    enc = tokenizer(args.prompt.strip())
    ids = jnp.asarray(enc["input_ids"])[None]

    tokens = generate(
        model,
        variables,
        input_ids=ids,
        pixel_values=pixel,
        generation_config=GenerationConfig(
            max_new_tokens=128,
            do_sample=True,
            temperature=0.7,
            top_p=0.9,
            pad_token_id=tokenizer.pad_token_id,
        ),
        rng=jax.random.PRNGKey(0),
    )
    text = tokenizer.batch_decode(np.asarray(tokens), skip_special_tokens=True)[0].strip()
    print(f"Generated_text: {text}")


if __name__ == "__main__":
    main()
