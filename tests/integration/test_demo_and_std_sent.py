"""Demo chat core + sentence-ifier CLIs + vision-embedding CLI on tiny checkpoints."""

import csv
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


pytestmark = pytest.mark.slow  # heavy equivalence/integration chain


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    from tests.models.hf_util import make_oracle
    from tests.util_tokenizer import build_tiny_tokenizer

    d = str(tmp_path_factory.mktemp("ckpt") / "model")
    model, cfg, _ = make_oracle("opt", image_size=32, patch_size=16, vocab_size=384)
    model.save_pretrained(d, safe_serialization=True)
    build_tiny_tokenizer(d, vocab_size=384)
    return d


@pytest.fixture(scope="module")
def opt_checkpoint(tmp_path_factory):
    """Bare OPT LM dir for TextLM-based CLIs."""
    import torch
    from transformers import OPTConfig as HFOPTConfig, OPTForCausalLM

    from tests.util_tokenizer import build_tiny_tokenizer

    d = str(tmp_path_factory.mktemp("optckpt") / "model")
    cfg = HFOPTConfig(
        vocab_size=384, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        ffn_dim=32, max_position_embeddings=256, word_embed_proj_dim=16,
        dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    OPTForCausalLM(cfg).save_pretrained(d, safe_serialization=True)
    build_tiny_tokenizer(d, vocab_size=384)
    return d


@pytest.fixture(scope="module")
def llama_checkpoint(tmp_path_factory):
    """Bare LLaMA LM dir - the model family the reference actually runs for
    these CLIs (generate_std_sent.py:24-45)."""
    import torch
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    from tests.util_tokenizer import build_tiny_tokenizer

    d = str(tmp_path_factory.mktemp("llamackpt") / "model")
    cfg = HFLlamaConfig(
        vocab_size=384, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=64, max_position_embeddings=256,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).save_pretrained(d, safe_serialization=True)
    build_tiny_tokenizer(d, vocab_size=384)
    return d


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    from tests.data.test_native_decoder import _write_y4m

    p = tmp_path_factory.mktemp("vid") / "clip.mp4"
    _write_y4m(str(p), nframes=100, w=32, h=32, fps=10)
    return str(p)


def test_eilev_chat_core(checkpoint, video):
    """Drive the demo's chat state machine directly (the gradio/terminal UIs
    both sit on EilevChat)."""
    sys.path.insert(0, os.path.join(REPO, "demo"))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "eilev_demo", os.path.join(REPO, "demo", "eilev_demo.py")
    )
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    chat = demo.EilevChat(checkpoint, dtype_name="fp32")
    msg = chat.add_video(video)
    assert "added video 1" in msg
    reply = chat.respond("What is the camera wearer doing?")
    assert isinstance(reply, str)
    # state accumulates: video + question + reply in one block
    assert chat.prompts[-1][1] == 1
    assert "What is the camera wearer doing?" in chat.prompts[-1][0]
    chat.reset()
    assert chat.prompts == [("", 0)] and chat.videos == []


def test_eilev_chat_kv_reuse_matches_greedy(checkpoint, video):
    """--kv_reuse mode: incremental turns must equal from-scratch greedy turns
    on the same conversation (the ChatSession guarantee, exercised through
    the demo's prompt-builder/tokenizer/video plumbing)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "eilev_demo", os.path.join(REPO, "demo", "eilev_demo.py")
    )
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    import jax.numpy as jnp

    from eilev_tpu.data.prompts import generate_input_ids_and_labels_from_interleaved
    from eilev_tpu.generation import GenerationConfig, generate
    from eilev_tpu.ops.preprocess import process_videos

    chat = demo.EilevChat(checkpoint, dtype_name="fp32", kv_reuse=True)

    def reference_reply():
        """From-scratch greedy generate on chat's CURRENT prompt state."""
        inputs = generate_input_ids_and_labels_from_interleaved(
            chat.tokenizer, chat.prompts, None, chat.config.num_query_tokens, True
        )
        img = chat.config.vision_config.image_size
        pixel = process_videos(
            jnp.asarray(np.stack(chat.videos)), height=img, width=img,
            dtype=chat.dtype,
        )
        gen_cfg = GenerationConfig(
            max_new_tokens=32, pad_token_id=chat.tokenizer.pad_token_id
        ).with_eos(50118)
        toks = np.asarray(
            generate(
                chat.model, chat.variables,
                input_ids=jnp.asarray(inputs["input_ids"])[None],
                pixel_values=pixel,
                video_input_mask=jnp.asarray(inputs["video_input_mask"])[None],
                generation_config=gen_cfg,
            )
        )[0]
        toks = toks[toks != gen_cfg.pad_token_id]
        return chat.tokenizer.decode([int(t) for t in toks], skip_special_tokens=True).strip()

    chat.add_video(video)
    chat.add_text("What is the camera wearer doing?")
    ref1 = reference_reply()
    reply1 = chat.respond_kv_reuse("")
    assert reply1 == ref1
    assert not chat.session.reused_last_turn  # first turn builds the cache

    chat.add_text("And then?")
    ref2 = reference_reply()
    reply2 = chat.respond_kv_reuse("")
    assert reply2 == ref2
    # the cache survived the turn boundary (rollback absorbs retokenization
    # drift in the reply region; the video/context KV is never re-encoded)
    assert chat.session.reused_last_turn


def test_eilev_chat_engine_matches_greedy(checkpoint, video):
    """--engine mode: turns served by a persistent ContinuousBatchingEngine
    must equal from-scratch greedy turns. The video count GROWS between turns
    (1 then 2), exercising the engine's variable-geometry admission +
    video_bucket cold-encode through the demo's plumbing."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "eilev_demo", os.path.join(REPO, "demo", "eilev_demo.py")
    )
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    import jax.numpy as jnp

    from eilev_tpu.data.prompts import generate_input_ids_and_labels_from_interleaved
    from eilev_tpu.generation import GenerationConfig, generate
    from eilev_tpu.ops.preprocess import process_videos

    chat = demo.EilevChat(checkpoint, dtype_name="fp32", engine=True)

    def reference_reply():
        inputs = generate_input_ids_and_labels_from_interleaved(
            chat.tokenizer, chat.prompts, None, chat.config.num_query_tokens, True
        )
        img = chat.config.vision_config.image_size
        pixel = process_videos(
            jnp.asarray(np.stack(chat.videos)), height=img, width=img,
            dtype=chat.dtype,
        )
        gen_cfg = GenerationConfig(
            max_new_tokens=32, pad_token_id=chat.tokenizer.pad_token_id
        ).with_eos(50118)
        toks = np.asarray(
            generate(
                chat.model, chat.variables,
                input_ids=jnp.asarray(inputs["input_ids"])[None],
                pixel_values=pixel,
                video_input_mask=jnp.asarray(inputs["video_input_mask"])[None],
                generation_config=gen_cfg,
            )
        )[0]
        toks = toks[toks != gen_cfg.pad_token_id]
        return chat.tokenizer.decode([int(t) for t in toks], skip_special_tokens=True).strip()

    chat.add_video(video)
    chat.add_text("What is the camera wearer doing?")
    ref1 = reference_reply()
    assert chat.respond("") == ref1
    assert chat.engine is not None and chat.engine.idle

    chat.add_video(video)  # second video: turn geometry changes
    chat.add_text("And then?")
    ref2 = reference_reply()
    assert chat.respond("") == ref2


@pytest.mark.parametrize("backend", ["opt", "llama"])
def test_generate_std_sent_cli(opt_checkpoint, llama_checkpoint, backend, tmp_path):
    ckpt = opt_checkpoint if backend == "opt" else llama_checkpoint
    ann = tmp_path / "ann.csv"
    with open(ann, "w", newline="") as f:
        w = csv.DictWriter(f, ["frame_path", "structured_verb", "structured_noun"])
        w.writeheader()
        w.writerow(dict(frame_path="a", structured_verb="cut_(slice)", structured_noun="onion_(bulb)"))
        w.writerow(dict(frame_path="b", structured_verb="", structured_noun="x"))  # filtered
    out = tmp_path / "std.csv"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "scripts/ego4d/generate_std_sent.py",
         "--model", ckpt, "--annotation", str(ann),
         "--annotation_with_std_sent", str(out), "--max_new_tokens", "4"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == 1  # empty-verb row filtered
    assert rows[0]["narration_text"].endswith(".")
    assert "verb" not in rows[0] and "noun" not in rows[0]


def test_get_vision_model_embs_cli(checkpoint, tmp_path):
    import imageio.v3 as iio

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        fp = f"v{i}|0"
        d = frames / fp
        d.mkdir()
        for t in range(2):
            iio.imwrite(d / f"{fp}|{t}.png", rng.integers(0, 255, (32, 32, 3)).astype(np.uint8), extension=".png")
        rows.append(dict(frame_path=fp, video_uid=f"v{i}", clip_index="0",
                         narration_timestamp_sec="1.0", narration_text="#C C x",
                         structured_verb="take", structured_noun="knife"))
    with open(frames / "narrated_actions.csv", "w", newline="") as f:
        w = csv.DictWriter(f, list(rows[0]))
        w.writeheader()
        w.writerows(rows)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    prefix = str(tmp_path / "embs")
    proc = subprocess.run(
        [sys.executable, "scripts/get_vision_model_embs.py",
         "--model", checkpoint, "--dtype", "fp32", "--frames_dir", str(frames),
         "--batch_size", "2", "--num_subsample_frames", "2", "--output_prefix", prefix],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    embs = np.load(prefix + "_embs.npy")
    index = json.load(open(prefix + "_index.json"))
    assert embs.shape == (3, 16)  # tiny vision hidden
    assert index == ["v0|0", "v1|0", "v2|0"]


def test_video_blip_demo_lavis_spec_and_gating():
    """The LAVIS backend option (reference video_blip_demo.py:229-252):
    spec parsing is exact, and without the optional lavis package the
    backend exits with an actionable message instead of a stack trace."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "video_blip_demo", os.path.join(REPO, "demo", "video_blip_demo.py")
    )
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    assert demo.parse_lavis_spec("lavis:blip2_vicuna_instruct:vicuna7b") == (
        "blip2_vicuna_instruct", "vicuna7b",
    )
    for bad in ("lavis:name", "hf:name:type", "lavis::type", "lavis:name:"):
        with pytest.raises(ValueError, match="lavis:<name>:<model_type>"):
            demo.parse_lavis_spec(bad)

    try:
        import lavis  # noqa: F401

        pytest.skip("lavis installed; gating path not exercised")
    except ImportError:
        pass
    with pytest.raises(SystemExit, match="salesforce-lavis"):
        demo.LavisChat("lavis:blip2_vicuna_instruct:vicuna7b", "some-llm")
