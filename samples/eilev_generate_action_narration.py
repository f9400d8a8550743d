#!/usr/bin/env python
"""Generate an action narration from interleaved videos and texts.

CLI-parity target: /root/reference/samples/eilev_generate_action_narration.py -
alternating video-file/text arguments build the interleaved prompt; decode with
beam 5, max_new_tokens 32, length_penalty -1, and the OPT newline-eos quirk
(LAVIS BLIP-2 convention, eos=50118).

Usage:
  python samples/eilev_generate_action_narration.py \\
    video_1.mp4 "What is the camera wearer doing? He's fixing a bicycle." \\
    video_2.mp4 "What is the camera wearer doing?" \\
    --model /path/to/eilev-blip2-opt-2.7b
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
import os

import numpy as np

CLIP_SECONDS = 8
NUM_FRAMES = 8


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "videos_and_texts",
        nargs="+",
        help="space-separated videos and texts; file paths are videos, the rest text",
    )
    p.add_argument("--model", required=True, help="HF save_pretrained dir")
    p.add_argument("--processor", default=None)
    p.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    args = p.parse_args()

    import jax.numpy as jnp

    from eilev_tpu.configs import OPTConfig
    from eilev_tpu.data.prompts import generate_input_ids_and_labels_from_interleaved
    from eilev_tpu.generation import GenerationConfig, generate
    from eilev_tpu.models.auto import load_model, load_tokenizer
    from eilev_tpu.native import VideoDecoder
    from eilev_tpu.ops.preprocess import process_videos

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model, variables, config = load_model(args.model, dtype=dtype)
    tokenizer = load_tokenizer(args.processor or args.model)

    # parse alternating videos and texts (reference samples/...py:20-50)
    prompts: list[tuple[str, int]] = [("", 0)]
    frames_list: list[np.ndarray] = []
    for arg in args.videos_and_texts:
        stripped = arg.strip()
        if os.path.isfile(stripped):
            # a video starts a new text block if the previous one has text
            if prompts[-1][0] != "":
                prompts.append(("", 0))
            with VideoDecoder(stripped) as dec:
                end = min(CLIP_SECONDS, dec.duration)
                frames_list.append(dec.decode_clip(0.0, end, NUM_FRAMES))
            text_block, num_video = prompts[-1]
            prompts[-1] = (text_block, num_video + 1)
        else:
            text_block, num_video = prompts[-1]
            text_block = (text_block + " " + stripped).strip()
            prompts[-1] = (text_block, num_video)

    inputs = generate_input_ids_and_labels_from_interleaved(
        tokenizer,
        prompts,
        None,
        config.num_query_tokens,
        config.use_decoder_only_language_model,
    )
    img = config.vision_config.image_size
    pixel = process_videos(
        jnp.asarray(np.stack(frames_list)), height=img, width=img, dtype=dtype
    )

    gen_cfg = GenerationConfig(
        max_new_tokens=32,
        num_beams=5,
        do_sample=False,
        length_penalty=-1.0,
        pad_token_id=tokenizer.pad_token_id,
    )
    if isinstance(config.text_config, OPTConfig):
        # LAVIS BLIP-2 OPT convention: newline as eos
        gen_cfg = gen_cfg.with_eos(50118)

    tokens = generate(
        model,
        variables,
        input_ids=jnp.asarray(inputs["input_ids"])[None],
        pixel_values=pixel,
        video_input_mask=jnp.asarray(inputs["video_input_mask"])[None],
        generation_config=gen_cfg,
    )
    text = tokenizer.batch_decode(np.asarray(tokens), skip_special_tokens=True)[0].strip()
    print(f"Generated_text: {text}")


if __name__ == "__main__":
    main()
