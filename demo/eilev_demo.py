#!/usr/bin/env python
"""Interactive EILeV chat demo: interleave videos and text, generate narrations.

Parity target: /root/reference/demo/eilev_demo.py (Gradio Blocks chat holding
{text_blocks, videos, text_block_video_map} state; each turn rebuilds the full
interleaved prompt and beam-searches with length_penalty=-1 and the OPT
newline-eos quirk; videos capped at 8 s / 8 frames).

Runs as a Gradio app when gradio is installed; otherwise as a terminal chat
(type a message, or `/video <path>` to add a clip, `/reset` to clear).
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

MAX_CLIP_SECONDS = 8
NUM_FRAMES = 8


class EilevChat:
    """Interleaved chat state + generation (framework-agnostic core)."""

    def __init__(self, model_path: str, processor_path=None, dtype_name: str = "bf16",
                 int8_lm: bool = False, int8_kv: bool = False,
                 int8_vision: bool = False, kv_reuse: bool = False,
                 engine: bool = False):
        import jax.numpy as jnp

        from eilev_tpu.models.auto import load_model, load_tokenizer

        self.dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
        self.model, self.variables, self.config = load_model(
            model_path, dtype=self.dtype, int8_lm=int8_lm, int8_kv=int8_kv,
            int8_vision=int8_vision,
        )
        self.tokenizer = load_tokenizer(processor_path or model_path)
        self.kv_reuse = kv_reuse
        self.engine_mode = engine
        self.session = None
        self.engine = None
        self.reset()

    def reset(self) -> None:
        # blocks of (text, num_videos_before_text), reference-style state
        self.prompts: list[tuple[str, int]] = [("", 0)]
        self.videos: list[np.ndarray] = []
        if self.session is not None:
            self.session.reset()

    def add_video(self, path: str) -> str:
        from eilev_tpu.native import VideoDecoder

        if self.prompts[-1][0] != "":
            self.prompts.append(("", 0))
        with VideoDecoder(path) as dec:
            end = min(MAX_CLIP_SECONDS, dec.duration)
            self.videos.append(dec.decode_clip(0.0, end, NUM_FRAMES))
        text, n = self.prompts[-1]
        self.prompts[-1] = (text, n + 1)
        return f"[added video {len(self.videos)}: {path}]"

    def add_text(self, text: str) -> None:
        block, n = self.prompts[-1]
        self.prompts[-1] = ((block + " " + text).strip(), n)

    def respond_kv_reuse(self, user_text: str) -> str:
        """Greedy turn over a persistent ``ChatSession``: only this turn's new
        tokens/videos are prefilled (serving/session.py) — earlier turns' KV
        stays resident. Trades the reference demo's beam-5 for incremental
        multi-turn latency; token-identical to a from-scratch greedy turn."""
        import jax.numpy as jnp

        from eilev_tpu.configs import OPTConfig
        from eilev_tpu.data.prompts import generate_input_ids_and_labels_from_interleaved
        from eilev_tpu.generation import GenerationConfig
        from eilev_tpu.ops.preprocess import process_videos
        from eilev_tpu.serving import ChatSession

        if self.session is None:
            gen_cfg = GenerationConfig(
                max_new_tokens=32, pad_token_id=self.tokenizer.pad_token_id
            )
            if isinstance(self.config.text_config, OPTConfig):
                gen_cfg = gen_cfg.with_eos(50118)  # OPT newline eos
            self.session = ChatSession(self.model, self.variables, gen_cfg)
        if user_text.strip():
            self.add_text(user_text.strip())
        inputs = generate_input_ids_and_labels_from_interleaved(
            self.tokenizer,
            self.prompts,
            None,
            self.config.num_query_tokens,
            self.config.use_decoder_only_language_model,
        )
        pixel = None
        if self.videos:
            img = self.config.vision_config.image_size
            pixel = process_videos(
                jnp.asarray(np.stack(self.videos)), height=img, width=img,
                dtype=self.dtype,
            )
        reply_tokens = self.session.turn(
            np.asarray(inputs["input_ids"]), pixel,
            np.asarray(inputs["video_input_mask"]),
        )
        reply = self.tokenizer.decode(
            [int(t) for t in reply_tokens], skip_special_tokens=True
        ).strip()
        self.add_text(reply)
        return reply

    def respond_engine(self, user_text: str) -> str:
        """Greedy turn through a persistent ``ContinuousBatchingEngine``: the
        chat workload has a DIFFERENT video count every turn, and the engine's
        ``video_bucket`` cold-encode path keeps that variable geometry on one
        compiled ViT program (serving/engine.py round-5 admission). The same
        engine instance could concurrently serve other chats' requests —
        this is the production-serving composition of the demo."""
        import jax.numpy as jnp

        from eilev_tpu.configs import OPTConfig
        from eilev_tpu.data.prompts import generate_input_ids_and_labels_from_interleaved
        from eilev_tpu.generation import GenerationConfig
        from eilev_tpu.ops.preprocess import process_videos
        from eilev_tpu.serving import ContinuousBatchingEngine, Request

        if self.engine is None:
            gen_cfg = GenerationConfig(
                max_new_tokens=32, pad_token_id=self.tokenizer.pad_token_id
            )
            if isinstance(self.config.text_config, OPTConfig):
                gen_cfg = gen_cfg.with_eos(50118)  # OPT newline eos
            self.engine = ContinuousBatchingEngine(
                self.model, self.variables, gen_cfg, max_slots=2,
                max_len=2048, chunk_tokens=8, prefill_bucket=256,
                video_bucket=4,
            )
        if user_text.strip():
            self.add_text(user_text.strip())
        inputs = generate_input_ids_and_labels_from_interleaved(
            self.tokenizer,
            self.prompts,
            None,
            self.config.num_query_tokens,
            self.config.use_decoder_only_language_model,
        )
        pixel = vim = None
        if self.videos:
            img = self.config.vision_config.image_size
            pixel = np.asarray(process_videos(
                jnp.asarray(np.stack(self.videos)), height=img, width=img,
                dtype=self.dtype,
            ))
            vim = np.asarray(inputs["video_input_mask"])
        req = Request(
            input_ids=np.asarray(inputs["input_ids"]),
            pixel_values=pixel, video_input_mask=vim,
        )
        done = self.engine.run([req])
        (completion,) = done.values()
        pad = self.engine.gen_cfg.pad_token_id
        reply = self.tokenizer.decode(
            [int(t) for t in completion.tokens if t != pad],
            skip_special_tokens=True,
        ).strip()
        self.add_text(reply)
        return reply

    def respond(self, user_text: str) -> str:
        import jax.numpy as jnp

        from eilev_tpu.configs import OPTConfig
        from eilev_tpu.data.prompts import generate_input_ids_and_labels_from_interleaved
        from eilev_tpu.generation import GenerationConfig, generate
        from eilev_tpu.ops.preprocess import process_videos

        if self.kv_reuse:
            return self.respond_kv_reuse(user_text)
        if self.engine_mode:
            return self.respond_engine(user_text)
        if user_text.strip():
            self.add_text(user_text.strip())
        inputs = generate_input_ids_and_labels_from_interleaved(
            self.tokenizer,
            self.prompts,
            None,
            self.config.num_query_tokens,
            self.config.use_decoder_only_language_model,
        )
        gen_cfg = GenerationConfig(
            max_new_tokens=32,
            num_beams=5,
            length_penalty=-1.0,
            pad_token_id=self.tokenizer.pad_token_id,
        )
        if isinstance(self.config.text_config, OPTConfig):
            gen_cfg = gen_cfg.with_eos(50118)  # OPT newline eos (LAVIS convention)
        kwargs = {}
        if self.videos:
            img = self.config.vision_config.image_size
            kwargs["pixel_values"] = process_videos(
                jnp.asarray(np.stack(self.videos)), height=img, width=img, dtype=self.dtype
            )
            kwargs["video_input_mask"] = jnp.asarray(inputs["video_input_mask"])[None]
        tokens = generate(
            self.model,
            self.variables,
            input_ids=jnp.asarray(inputs["input_ids"])[None],
            generation_config=gen_cfg,
            **kwargs,
        )
        reply = self.tokenizer.batch_decode(np.asarray(tokens), skip_special_tokens=True)[0].strip()
        self.add_text(reply)
        return reply

    def respond_stream_kv_reuse(self, user_text: str):
        """Streaming turn over the persistent session: incremental prefill
        (only this turn's new tokens/videos) + chunked token streaming."""
        import jax.numpy as jnp

        from eilev_tpu.configs import OPTConfig
        from eilev_tpu.data.prompts import generate_input_ids_and_labels_from_interleaved
        from eilev_tpu.generation import GenerationConfig
        from eilev_tpu.ops.preprocess import process_videos
        from eilev_tpu.serving import ChatSession

        if self.session is None:
            gen_cfg = GenerationConfig(
                max_new_tokens=32, pad_token_id=self.tokenizer.pad_token_id
            )
            if isinstance(self.config.text_config, OPTConfig):
                gen_cfg = gen_cfg.with_eos(50118)
            self.session = ChatSession(self.model, self.variables, gen_cfg)
        if user_text.strip():
            self.add_text(user_text.strip())
        inputs = generate_input_ids_and_labels_from_interleaved(
            self.tokenizer,
            self.prompts,
            None,
            self.config.num_query_tokens,
            self.config.use_decoder_only_language_model,
        )
        pixel = None
        if self.videos:
            img = self.config.vision_config.image_size
            pixel = process_videos(
                jnp.asarray(np.stack(self.videos)), height=img, width=img,
                dtype=self.dtype,
            )
        emitted: list[int] = []
        shown = ""
        for chunk in self.session.turn_stream(
            np.asarray(inputs["input_ids"]), pixel,
            np.asarray(inputs["video_input_mask"]),
        ):
            emitted.extend(int(t) for t in chunk)
            text = self.tokenizer.decode(emitted, skip_special_tokens=True)
            if len(text) > len(shown):
                yield text[len(shown):]
                shown = text
        self.add_text(shown.strip())

    def respond_stream(self, user_text: str):
        """Greedy streaming variant of :meth:`respond`: yields text deltas as
        token chunks arrive (beam search cannot stream, so this path trades
        the demo's beam-5 for incremental display)."""
        import jax.numpy as jnp

        from eilev_tpu.configs import OPTConfig
        from eilev_tpu.data.prompts import generate_input_ids_and_labels_from_interleaved
        from eilev_tpu.generation import GenerationConfig, generate_stream
        from eilev_tpu.ops.preprocess import process_videos

        if self.kv_reuse:
            yield from self.respond_stream_kv_reuse(user_text)
            return
        if user_text.strip():
            self.add_text(user_text.strip())
        inputs = generate_input_ids_and_labels_from_interleaved(
            self.tokenizer,
            self.prompts,
            None,
            self.config.num_query_tokens,
            self.config.use_decoder_only_language_model,
        )
        gen_cfg = GenerationConfig(max_new_tokens=32, pad_token_id=self.tokenizer.pad_token_id)
        if isinstance(self.config.text_config, OPTConfig):
            gen_cfg = gen_cfg.with_eos(50118)
        kwargs = {}
        if self.videos:
            img = self.config.vision_config.image_size
            kwargs["pixel_values"] = process_videos(
                jnp.asarray(np.stack(self.videos)), height=img, width=img, dtype=self.dtype
            )
            kwargs["video_input_mask"] = jnp.asarray(inputs["video_input_mask"])[None]
        emitted: list[int] = []
        shown = ""
        for chunk in generate_stream(
            self.model,
            self.variables,
            input_ids=jnp.asarray(inputs["input_ids"])[None],
            generation_config=gen_cfg,
            **kwargs,
        ):
            emitted.extend(int(t) for t in chunk[0] if t != gen_cfg.pad_token_id)
            text = self.tokenizer.decode(emitted, skip_special_tokens=True)
            if len(text) > len(shown):
                yield text[len(shown):]
                shown = text
        self.add_text(shown.strip())


def run_terminal(chat: EilevChat, stream: bool = False) -> None:
    print("EILeV chat (terminal mode). Commands: /video <path>, /reset, /quit")
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line:
            continue
        if line == "/quit":
            break
        if line == "/reset":
            chat.reset()
            print("[reset]")
            continue
        if line.startswith("/video "):
            print(chat.add_video(line[len("/video ") :].strip()))
            continue
        if stream:
            for delta in chat.respond_stream(line):
                print(delta, end="", flush=True)
            print()
        else:
            print(chat.respond(line))


def run_gradio(chat: EilevChat, share: bool) -> None:
    import gradio as gr  # type: ignore

    with gr.Blocks(title="EILeV Demo") as app:
        chatbot = gr.Chatbot()
        with gr.Row():
            video_in = gr.Video(label="Add a video")
            text_in = gr.Textbox(label="Message")
        clear = gr.Button("Reset")

        def on_video(video, history):
            if video:
                msg = chat.add_video(video)
                history = (history or []) + [(msg, None)]
            return history

        def on_text(text, history):
            reply = chat.respond(text)
            return "", (history or []) + [(text, reply)]

        def on_clear():
            chat.reset()
            return []

        video_in.change(on_video, [video_in, chatbot], chatbot)
        text_in.submit(on_text, [text_in, chatbot], [text_in, chatbot])
        clear.click(on_clear, None, chatbot)
    app.launch(share=share)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--processor", default=None)
    p.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--int8_lm", action="store_true",
                   help="weight-only int8 LM serving mode (ops/quantization.py)")
    p.add_argument("--int8_kv", action="store_true",
                   help="int8 KV cache via the Pallas VMEM-dequant kernel")
    p.add_argument("--int8_vision", action="store_true",
                   help="W8A8 vision tower on the int8 MXU path (serving mode)")
    p.add_argument("--kv_reuse", action="store_true",
                   help="keep the session KV cache across turns and prefill "
                        "only each turn's new tokens/videos (greedy; the "
                        "default beam-5 re-prefills like the reference demo)")
    p.add_argument("--engine", action="store_true",
                   help="serve turns through a persistent continuous-batching "
                        "engine (greedy; variable per-turn video counts share "
                        "one compiled ViT program via video_bucket)")
    p.add_argument("--terminal", action="store_true", help="force terminal mode")
    p.add_argument("--stream", action="store_true",
                   help="terminal mode: stream tokens as they decode (greedy; "
                        "beam search cannot stream)")
    p.add_argument("--share", action="store_true")
    args = p.parse_args()

    chat = EilevChat(
        args.model, args.processor, args.dtype,
        int8_lm=args.int8_lm, int8_kv=args.int8_kv,
        int8_vision=args.int8_vision, kv_reuse=args.kv_reuse,
        engine=args.engine,
    )
    if args.terminal or args.stream:
        run_terminal(chat, stream=args.stream)
        return
    try:
        run_gradio(chat, args.share)
    except ImportError:
        print("gradio not installed; falling back to terminal mode")
        run_terminal(chat)


if __name__ == "__main__":
    main()
