"""Helpers to build tiny random-weight HF / reference-model oracles for parity tests.

The reference repo (read-only at /root/reference) is imported ONLY inside tests as a
numerical oracle - the framework itself never touches it.
"""

from __future__ import annotations

import sys

import numpy as np
import torch

from eilev_tpu import configs
from eilev_tpu.models.convert import convert_videoblip

REFERENCE_PATH = "/root/reference"


def import_reference_v2():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from eilev.model.v2 import VideoBlipForConditionalGeneration  # type: ignore

    return VideoBlipForConditionalGeneration


def import_reference_v1():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from eilev.model.v1 import VideoBlipForConditionalGeneration  # type: ignore

    return VideoBlipForConditionalGeneration


def hf_blip2_config(cfg: configs.VideoBlipConfig):
    from transformers import Blip2Config

    vis = cfg.vision_config
    qf = cfg.qformer_config
    vision = dict(
        hidden_size=vis.hidden_size,
        intermediate_size=vis.intermediate_size,
        num_hidden_layers=vis.num_hidden_layers,
        num_attention_heads=vis.num_attention_heads,
        image_size=vis.image_size,
        patch_size=vis.patch_size,
        layer_norm_eps=vis.layer_norm_eps,
        qkv_bias=vis.qkv_bias,
        hidden_act=vis.hidden_act,
    )
    qformer = dict(
        hidden_size=qf.hidden_size,
        num_hidden_layers=qf.num_hidden_layers,
        num_attention_heads=qf.num_attention_heads,
        intermediate_size=qf.intermediate_size,
        cross_attention_frequency=qf.cross_attention_frequency,
        encoder_hidden_size=qf.encoder_hidden_size,
        layer_norm_eps=qf.layer_norm_eps,
        vocab_size=32,
    )
    if isinstance(cfg.text_config, configs.OPTConfig):
        t = cfg.text_config
        text = dict(
            model_type="opt",
            vocab_size=t.vocab_size,
            hidden_size=t.hidden_size,
            num_hidden_layers=t.num_hidden_layers,
            num_attention_heads=t.num_attention_heads,
            ffn_dim=t.ffn_dim,
            max_position_embeddings=t.max_position_embeddings,
            word_embed_proj_dim=t.word_embed_proj_dim,
            do_layer_norm_before=t.do_layer_norm_before,
            activation_function=t.activation_function,
            dropout=0.0,
            attention_dropout=0.0,
            layerdrop=0.0,
        )
    else:
        t = cfg.text_config
        text = dict(
            model_type="t5",
            vocab_size=t.vocab_size,
            d_model=t.d_model,
            d_kv=t.d_kv,
            d_ff=t.d_ff,
            num_layers=t.num_layers,
            num_decoder_layers=t.num_decoder_layers,
            num_heads=t.num_heads,
            relative_attention_num_buckets=t.relative_attention_num_buckets,
            relative_attention_max_distance=t.relative_attention_max_distance,
            feed_forward_proj="gated-gelu" if t.is_gated_act else "relu",
            tie_word_embeddings=t.tie_word_embeddings,
            dropout_rate=0.0,
            decoder_start_token_id=t.decoder_start_token_id,
            pad_token_id=t.pad_token_id,
            eos_token_id=t.eos_token_id,
        )
    return Blip2Config(
        vision_config=vision,
        qformer_config=qformer,
        text_config=text,
        num_query_tokens=cfg.num_query_tokens,
    )


def make_oracle(text_model: str = "opt", seed: int = 0, **tiny_kwargs):
    """Returns (reference torch model [eval, randomized], our config, our params)."""
    cfg = configs.tiny_config(text_model=text_model, **tiny_kwargs)
    hf_cfg = hf_blip2_config(cfg)
    ref_cls = import_reference_v2()
    torch.manual_seed(seed)
    model = ref_cls(hf_cfg).eval()
    # query_tokens are zero-initialized by HF's _init_weights; randomize for signal.
    with torch.no_grad():
        model.query_tokens.normal_(0, 0.5)
    params = convert_videoblip(model.state_dict(), cfg)
    return model, cfg, params


def t2n(t: torch.Tensor) -> np.ndarray:
    return t.detach().cpu().numpy()
