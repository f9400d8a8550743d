"""Model loading: HF ``save_pretrained`` directories -> (model, params, config).

Reads the reference ecosystem's checkpoint layout (config.json + *.safetensors,
e.g. kpyu/eilev-blip2-opt-2.7b downloaded locally) and builds the corresponding
TPU model - the "switch from the reference" entry point.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax.numpy as jnp

from ..configs import OPTConfig, QFormerConfig, T5Config, VideoBlipConfig, VisionConfig
from .convert import load_hf_checkpoint
from .video_blip import VideoBlipForConditionalGeneration
from .video_blip_v1 import VideoBlipV1ForConditionalGeneration


def config_from_hf_dict(cfg: dict) -> VideoBlipConfig:
    """Translate an HF Blip2Config dict (config.json) into VideoBlipConfig."""
    v = cfg["vision_config"]
    q = cfg["qformer_config"]
    t = cfg["text_config"]
    vision = VisionConfig(
        hidden_size=v.get("hidden_size", 1408),
        intermediate_size=v.get("intermediate_size", 6144),
        num_hidden_layers=v.get("num_hidden_layers", 39),
        num_attention_heads=v.get("num_attention_heads", 16),
        image_size=v.get("image_size", 224),
        patch_size=v.get("patch_size", 14),
        layer_norm_eps=v.get("layer_norm_eps", 1e-6),
        qkv_bias=v.get("qkv_bias", True),
        hidden_act=v.get("hidden_act", "gelu"),
    )
    qformer = QFormerConfig(
        hidden_size=q.get("hidden_size", 768),
        num_hidden_layers=q.get("num_hidden_layers", 12),
        num_attention_heads=q.get("num_attention_heads", 12),
        intermediate_size=q.get("intermediate_size", 3072),
        cross_attention_frequency=q.get("cross_attention_frequency", 2),
        encoder_hidden_size=q.get("encoder_hidden_size", 1408),
        layer_norm_eps=q.get("layer_norm_eps", 1e-12),
        hidden_act=q.get("hidden_act", "gelu"),
    )
    model_type = t.get("model_type", "opt")
    text: Any
    if model_type == "opt":
        text = OPTConfig(
            vocab_size=t.get("vocab_size", 50272),
            hidden_size=t.get("hidden_size", 2560),
            num_hidden_layers=t.get("num_hidden_layers", 32),
            num_attention_heads=t.get("num_attention_heads", 32),
            ffn_dim=t.get("ffn_dim", 10240),
            max_position_embeddings=t.get("max_position_embeddings", 2048),
            word_embed_proj_dim=t.get("word_embed_proj_dim", t.get("hidden_size", 2560)),
            do_layer_norm_before=t.get("do_layer_norm_before", True),
            activation_function=t.get("activation_function", "relu"),
            bos_token_id=t.get("bos_token_id", 2),
            eos_token_id=t.get("eos_token_id", 2),
            pad_token_id=t.get("pad_token_id", 1),
        )
    elif model_type == "t5":
        ff_proj = t.get("feed_forward_proj", "gated-gelu")
        gated = ff_proj.startswith("gated-")
        act = ff_proj.split("-")[-1]
        text = T5Config(
            vocab_size=t.get("vocab_size", 32128),
            d_model=t.get("d_model", 2048),
            d_kv=t.get("d_kv", 64),
            d_ff=t.get("d_ff", 5120),
            num_layers=t.get("num_layers", 24),
            num_decoder_layers=t.get("num_decoder_layers", t.get("num_layers", 24)),
            num_heads=t.get("num_heads", 32),
            relative_attention_num_buckets=t.get("relative_attention_num_buckets", 32),
            relative_attention_max_distance=t.get("relative_attention_max_distance", 128),
            layer_norm_epsilon=t.get("layer_norm_epsilon", 1e-6),
            is_gated_act=gated,
            dense_act_fn="gelu_new" if act == "gelu" and gated else act,
            tie_word_embeddings=t.get("tie_word_embeddings", False),
            pad_token_id=t.get("pad_token_id", 0),
            eos_token_id=t.get("eos_token_id", 1),
            decoder_start_token_id=t.get("decoder_start_token_id", 0),
        )
    else:
        raise ValueError(f"unsupported text model type: {model_type}")
    return VideoBlipConfig(
        vision_config=vision,
        qformer_config=qformer,
        text_config=text,
        num_query_tokens=cfg.get("num_query_tokens", 32),
    )


def load_model(
    path: str,
    *,
    version: str = "v2",
    dtype=jnp.float32,
    param_dtype=None,
    int8_lm: bool = False,
    int8_kv: bool = False,
    int8_vision: bool = False,
    int8_qformer: bool = False,
    w8a8_prefill: bool = False,
    remat: bool = False,
):
    """Load a save_pretrained dir -> (model module, {'params': ...}, config).

    ``int8_lm=True`` opts the language model into the weight-only int8 serving
    path (ops/quantization.py): halves the LM weight stream the decode step is
    HBM-bound on. ``int8_kv=True`` additionally stores the decode KV cache in
    int8, read through the Pallas VMEM-dequant kernel
    (ops/decode_attention.py): halves the cache stream too — the dominant
    decode cost at batch >= 8. ``int8_vision=True`` runs the (MXU-bound)
    vision tower's GEMMs as W8A8 on the int8 MXU path — measured 1.2-1.8x on
    v5e (benchmarks/int8_mxu_probe.py); ``int8_qformer=True`` extends that to
    the Q-Former's GEMMs; ``w8a8_prefill=True`` (requires ``int8_lm``) runs
    the LM's large-M matmuls — the PREFILL — on the int8 MXU too, while the
    decode step keeps the weight-only read (static shape dispatch,
    ops/quantization.py:Int8Dense). None is bit-parity with bf16 — off by
    default.
    """
    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    config = config_from_hf_dict(hf_cfg)
    if w8a8_prefill and not int8_lm:
        raise ValueError("w8a8_prefill requires int8_lm (shared int8 weights)")
    if int8_lm or int8_kv:
        import dataclasses

        from ..configs import replace as cfg_replace

        if not isinstance(config.text_config, OPTConfig):
            raise ValueError("int8_lm/int8_kv currently support OPT-family LMs only")
        config = cfg_replace(
            config,
            text_config=dataclasses.replace(
                config.text_config,
                quantize_matmuls=int8_lm,
                int8_kv_cache=int8_kv,
                w8a8_prefill=w8a8_prefill,
            ),
        )
    if int8_qformer:
        import dataclasses

        from ..configs import replace as cfg_replace

        config = cfg_replace(
            config,
            qformer_config=dataclasses.replace(
                config.qformer_config, quantize_matmuls=True
            ),
        )
    if int8_vision:
        import dataclasses

        from ..configs import replace as cfg_replace

        config = cfg_replace(
            config,
            vision_config=dataclasses.replace(
                config.vision_config, quantize_matmuls=True
            ),
        )
    if remat:
        import dataclasses

        from ..configs import replace as cfg_replace

        config = cfg_replace(
            config,
            text_config=dataclasses.replace(config.text_config, remat=True),
        )
    params = load_hf_checkpoint(path, config, dtype=param_dtype)
    if int8_lm:
        from ..ops.quantization import quantize_lm_params

        params = dict(params)
        params["language_model"] = quantize_lm_params(params["language_model"])
    if int8_vision:
        from ..ops.quantization import quantize_vision_params

        params = dict(params)
        params["vision_model"] = quantize_vision_params(params["vision_model"])
    if int8_qformer:
        from ..ops.quantization import quantize_qformer_params

        params = dict(params)
        params["qformer"] = quantize_qformer_params(params["qformer"])
    cls = (
        VideoBlipForConditionalGeneration
        if version == "v2"
        else VideoBlipV1ForConditionalGeneration
    )
    model = cls(config, dtype=dtype)
    return model, {"params": params}, config


def load_tokenizer(path: str):
    """HF tokenizer from a local directory (tokenizers are pure host-side)."""
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(path)
