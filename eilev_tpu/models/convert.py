"""HF checkpoint -> EILeV-TPU parameter conversion.

Maps a ``transformers`` state dict (torch tensors or numpy arrays; from an in-memory
model or a ``safetensors`` file) of ``Blip2ForConditionalGeneration``-shaped weights
(including the reference's ``VideoBlipForConditionalGeneration`` checkpoints such as
kpyu/eilev-blip2-opt-2.7b) onto this framework's flax parameter pytree.

Torch Linear weights are (out, in) and are transposed to flax's (in, out); the vision
patch conv (D, 3, p, p) is reshaped to the unfold-matmul layout (3*p*p, D).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ..configs import OPTConfig, T5Config, VideoBlipConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


class _SD:
    """State-dict view that tracks which keys were consumed."""

    def __init__(self, sd: Mapping[str, Any], prefix: str = ""):
        self.sd = sd
        self.prefix = prefix
        self.used: set[str] = set()

    def sub(self, prefix: str) -> "_SD":
        child = _SD(self.sd, self.prefix + prefix)
        child.used = self.used  # share
        return child

    def __call__(self, key: str) -> np.ndarray:
        full = self.prefix + key
        self.used.add(full)
        return _np(self.sd[full])

    def has(self, key: str) -> bool:
        return (self.prefix + key) in self.sd


def _linear(sd: _SD, key: str, bias: bool = True) -> dict[str, np.ndarray]:
    out = {"kernel": sd(f"{key}.weight").T}
    if bias and sd.has(f"{key}.bias"):
        out["bias"] = sd(f"{key}.bias")
    return out


def _ln(sd: _SD, key: str) -> dict[str, np.ndarray]:
    return {"scale": sd(f"{key}.weight"), "bias": sd(f"{key}.bias")}


def convert_vision(sd: _SD, num_layers: int) -> dict:
    """``vision_model.*`` of an HF Blip2 checkpoint -> VisionModel params."""
    p = sd("embeddings.patch_embedding.weight")  # (D, 3, p, p)
    d = p.shape[0]
    params: dict[str, Any] = {
        "embeddings": {
            # (D,3,p,p) -> (3,p,p,D) -> (3*p*p, D): matches the unfold layout
            # (channel-major within a patch) used by VisionEmbeddings.
            "patch_kernel": p.transpose(1, 2, 3, 0).reshape(-1, d),
            "patch_bias": sd("embeddings.patch_embedding.bias"),
            "class_embedding": sd("embeddings.class_embedding").reshape(d),
            "position_embedding": sd("embeddings.position_embedding").reshape(-1, d),
        },
        "post_layernorm": _ln(sd, "post_layernorm"),
    }
    for i in range(num_layers):
        lsd = sd.sub(f"encoder.layers.{i}.")
        params[f"layers_{i}"] = {
            "layer_norm1": _ln(lsd, "layer_norm1"),
            "layer_norm2": _ln(lsd, "layer_norm2"),
            "self_attn": {
                "qkv": _linear(lsd, "self_attn.qkv"),
                "projection": _linear(lsd, "self_attn.projection"),
            },
            "mlp": {
                "fc1": _linear(lsd, "mlp.fc1"),
                "fc2": _linear(lsd, "mlp.fc2"),
            },
        }
    return params


def _qformer_attention(sd: _SD) -> dict:
    return {
        "attention": {
            "query": _linear(sd, "attention.query"),
            "key": _linear(sd, "attention.key"),
            "value": _linear(sd, "attention.value"),
        },
        "output": {
            "dense": _linear(sd, "output.dense"),
            "layer_norm": _ln(sd, "output.LayerNorm"),
        },
    }


def convert_qformer(sd: _SD, num_layers: int, cross_attention_frequency: int) -> dict:
    params: dict[str, Any] = {"layernorm": _ln(sd, "layernorm")}
    for i in range(num_layers):
        lsd = sd.sub(f"encoder.layer.{i}.")
        layer: dict[str, Any] = {
            "attention": _qformer_attention(lsd.sub("attention.")),
            "ffn_query": {
                "intermediate": _linear(lsd, "intermediate_query.dense"),
                "output": _linear(lsd, "output_query.dense"),
                "layer_norm": _ln(lsd, "output_query.LayerNorm"),
            },
        }
        if i % cross_attention_frequency == 0:
            layer["crossattention"] = _qformer_attention(lsd.sub("crossattention."))
        params[f"layers_{i}"] = layer
    return params


def convert_opt(sd: _SD, config: OPTConfig) -> dict:
    """``language_model.*`` (OPTForCausalLM) -> OPTForCausalLM params."""
    dec = sd.sub("model.decoder.")
    params: dict[str, Any] = {
        "embed_tokens": {"embedding": dec("embed_tokens.weight")},
        "embed_positions": {"embedding": dec("embed_positions.weight")},
    }
    if config.word_embed_proj_dim != config.hidden_size:
        params["project_in"] = _linear(dec, "project_in", bias=False)
        params["project_out"] = _linear(dec, "project_out", bias=False)
    if config.do_layer_norm_before:
        params["final_norm"] = _ln(dec, "final_layer_norm")
    for i in range(config.num_hidden_layers):
        lsd = dec.sub(f"layers.{i}.")
        # q/k/v concatenate into the model's packed projection (opt.py stores
        # one (D, 3D) kernel; each dot output column is independent, so this
        # is bit-identical to HF's three separate projections)
        q, k, v = (
            _linear(lsd, f"self_attn.{n}_proj") for n in ("q", "k", "v")
        )
        params[f"layers_{i}"] = {
            "self_attn": {
                "qkv_proj": {
                    "kernel": np.concatenate(
                        [q["kernel"], k["kernel"], v["kernel"]], axis=1
                    ),
                    "bias": np.concatenate([q["bias"], k["bias"], v["bias"]]),
                },
                "out_proj": _linear(lsd, "self_attn.out_proj"),
            },
            "self_attn_layer_norm": _ln(lsd, "self_attn_layer_norm"),
            "final_layer_norm": _ln(lsd, "final_layer_norm"),
            "fc1": _linear(lsd, "fc1"),
            "fc2": _linear(lsd, "fc2"),
        }
    return params


def _t5_attention(sd: _SD) -> dict:
    out = {
        "q": _linear(sd, "q", bias=False),
        "k": _linear(sd, "k", bias=False),
        "v": _linear(sd, "v", bias=False),
        "o": _linear(sd, "o", bias=False),
    }
    if sd.has("relative_attention_bias.weight"):
        out["relative_attention_bias"] = {"embedding": sd("relative_attention_bias.weight")}
    return out


def _t5_ff(sd: _SD, gated: bool) -> dict:
    if gated:
        return {
            "wi_0": _linear(sd, "DenseReluDense.wi_0", bias=False),
            "wi_1": _linear(sd, "DenseReluDense.wi_1", bias=False),
            "wo": _linear(sd, "DenseReluDense.wo", bias=False),
        }
    return {
        "wi": _linear(sd, "DenseReluDense.wi", bias=False),
        "wo": _linear(sd, "DenseReluDense.wo", bias=False),
    }


def _t5_rms(sd: _SD, key: str) -> dict:
    return {"scale": sd(f"{key}.weight")}


def convert_t5(sd: _SD, config: T5Config) -> dict:
    """``language_model.*`` (T5ForConditionalGeneration) -> T5 params."""
    params: dict[str, Any] = {"shared": {"embedding": sd("shared.weight")}}
    if not config.tie_word_embeddings:
        params["lm_head"] = _linear(sd, "lm_head", bias=False)

    enc: dict[str, Any] = {"final_layer_norm": _t5_rms(sd.sub("encoder."), "final_layer_norm")}
    for i in range(config.num_layers):
        lsd = sd.sub(f"encoder.block.{i}.")
        enc[f"layers_{i}"] = {
            "self_attention": {
                "attention": _t5_attention(lsd.sub("layer.0.SelfAttention.")),
                "layer_norm": _t5_rms(lsd, "layer.0.layer_norm"),
            },
            "ff": {
                **_t5_ff(lsd.sub("layer.1."), config.is_gated_act),
                "layer_norm": _t5_rms(lsd, "layer.1.layer_norm"),
            },
        }
    params["encoder"] = enc

    dec: dict[str, Any] = {"final_layer_norm": _t5_rms(sd.sub("decoder."), "final_layer_norm")}
    for i in range(config.num_decoder_layers):
        lsd = sd.sub(f"decoder.block.{i}.")
        dec[f"layers_{i}"] = {
            "self_attention": {
                "attention": _t5_attention(lsd.sub("layer.0.SelfAttention.")),
                "layer_norm": _t5_rms(lsd, "layer.0.layer_norm"),
            },
            "cross_attention": {
                "attention": _t5_attention(lsd.sub("layer.1.EncDecAttention.")),
                "layer_norm": _t5_rms(lsd, "layer.1.layer_norm"),
            },
            "ff": {
                **_t5_ff(lsd.sub("layer.2."), config.is_gated_act),
                "layer_norm": _t5_rms(lsd, "layer.2.layer_norm"),
            },
        }
    params["decoder"] = dec
    return params


def convert_videoblip(state_dict: Mapping[str, Any], config: VideoBlipConfig) -> dict:
    """Full ``VideoBlipForConditionalGeneration`` state dict -> flax params."""
    sd = _SD(state_dict)
    params: dict[str, Any] = {
        "query_tokens": _np(state_dict["query_tokens"]).reshape(
            config.num_query_tokens, config.qformer_config.hidden_size
        ),
        "vision_model": {
            "vision": convert_vision(sd.sub("vision_model."), config.vision_config.num_hidden_layers)
        },
        "qformer": convert_qformer(
            sd.sub("qformer."),
            config.qformer_config.num_hidden_layers,
            config.qformer_config.cross_attention_frequency,
        ),
        "language_projection": _linear(sd, "language_projection"),
    }
    if isinstance(config.text_config, OPTConfig):
        params["language_model"] = convert_opt(sd.sub("language_model."), config.text_config)
    else:
        params["language_model"] = convert_t5(sd.sub("language_model."), config.text_config)
    return params


def load_hf_checkpoint(
    path: str, config: VideoBlipConfig, *, dtype=None
) -> dict:
    """Load a ``save_pretrained`` directory (safetensors) into flax params.

    Works without torch for pure-safetensors checkpoints. ``dtype`` optionally casts
    all params (e.g. jnp.bfloat16 for TPU serving).
    """
    import glob
    import os

    from safetensors import safe_open

    tensors: dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {path}")
    for f in files:
        with safe_open(f, framework="np") as sf:
            for k in sf.keys():
                tensors[k] = sf.get_tensor(k)
    params = convert_videoblip(tensors, config)
    if dtype is not None:
        import jax

        params = jax.tree.map(lambda a: a.astype(dtype), params)
    return params
