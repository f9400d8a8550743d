"""VideoMAE video classifier (flax.linen) - the reference's supervised baseline.

Parity target: ``transformers.VideoMAEForVideoClassification`` as used by
/root/reference/scripts/baselines/videomae/videomae_train.py (fine-tuned verb /
noun classifiers) and videomae_predict.py.

Structure: tubelet (2x16x16) patch embedding -> FIXED sinusoid position table ->
pre-LN ViT blocks whose q/v projections carry separate bias vectors with a zero
key bias (BEiT-style) -> mean pooling -> fc_norm -> linear classifier.

Input convention: (B, C, T, H, W) like the rest of this framework (HF VideoMAE
takes (B, T, C, H, W); the converter and this module agree on the framework
layout and permute internally).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention


@dataclass(frozen=True)
class VideoMAEConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    num_frames: int = 16
    tubelet_size: int = 2
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    qkv_bias: bool = True
    use_mean_pooling: bool = True
    num_labels: int = 2

    @property
    def num_patches(self) -> int:
        return (
            (self.image_size // self.patch_size) ** 2 * (self.num_frames // self.tubelet_size)
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def sinusoid_position_table(n_position: int, d_hid: int) -> np.ndarray:
    """HF's get_sinusoid_encoding_table (fixed, not learned)."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class VideoMAEAttention(nn.Module):
    config: VideoMAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        b, s, d = x.shape
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        # BEiT-style: no-bias projections + separate q/v bias params, zero k bias
        q = nn.Dense(d, use_bias=False, dtype=self.dtype, name="query")(x)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="key")(x)
        v = nn.Dense(d, use_bias=False, dtype=self.dtype, name="value")(x)
        if cfg.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (d,), jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros, (d,), jnp.float32)
            q = q + q_bias.astype(self.dtype)
            v = v + v_bias.astype(self.dtype)
        out = dot_product_attention(
            q.reshape(b, s, nh, hd),
            k.reshape(b, s, nh, hd),
            v.reshape(b, s, nh, hd),
            scale=hd**-0.5,
        ).reshape(b, s, d)
        return nn.Dense(d, dtype=self.dtype, name="output")(out)


class VideoMAELayer(nn.Module):
    config: VideoMAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        h = nn.LayerNorm(
            use_fast_variance=False, epsilon=cfg.layer_norm_eps, dtype=self.dtype,
            name="layernorm_before",
        )(x)
        x = x + VideoMAEAttention(cfg, dtype=self.dtype, name="attention")(h)
        h = nn.LayerNorm(
            use_fast_variance=False, epsilon=cfg.layer_norm_eps, dtype=self.dtype,
            name="layernorm_after",
        )(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(h)
        return x + h


class VideoMAEForVideoClassification(nn.Module):
    config: VideoMAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array, labels=None) -> dict:
        """pixel_values: (B, C, T, H, W) -> {'logits', 'loss'?}."""
        cfg = self.config
        b, c, t, h, w = pixel_values.shape
        p, ts = cfg.patch_size, cfg.tubelet_size
        gt, gh, gw = t // ts, h // p, w // p

        # tubelet conv == unfold (ts, p, p) bricks + one matmul on the MXU.
        # HF kernel layout (D, C, ts, p, p); feature order here: (c, dt, dh, dw).
        kernel = self.param(
            "patch_kernel", nn.initializers.normal(0.02), (c * ts * p * p, cfg.hidden_size),
            jnp.float32,
        )
        bias = self.param("patch_bias", nn.initializers.zeros, (cfg.hidden_size,), jnp.float32)
        x = pixel_values.reshape(b, c, gt, ts, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(b, gt * gh * gw, c * ts * p * p)
        x = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype)) + bias.astype(self.dtype)

        pos = sinusoid_position_table(cfg.num_patches, cfg.hidden_size)
        x = x + jnp.asarray(pos, self.dtype)[None, : x.shape[1]]

        for i in range(cfg.num_hidden_layers):
            x = VideoMAELayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)

        if cfg.use_mean_pooling:
            pooled = x.mean(axis=1)
            pooled = nn.LayerNorm(
                use_fast_variance=False, epsilon=1e-5, dtype=self.dtype, name="fc_norm"
            )(pooled)
        else:
            x = nn.LayerNorm(
                use_fast_variance=False, epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                name="layernorm",
            )(x)
            pooled = x[:, 0]
        logits = nn.Dense(cfg.num_labels, dtype=self.dtype, name="classifier")(pooled)
        out = {"logits": logits}
        if labels is not None:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            out["loss"] = -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
        return out


def convert_videomae(state_dict, config: VideoMAEConfig) -> dict:
    """HF VideoMAEForVideoClassification state dict -> flax params."""

    def np_(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().float().numpy()
        return np.asarray(x)

    def linear(key, bias=True):
        out = {"kernel": np_(state_dict[f"{key}.weight"]).T}
        if bias and f"{key}.bias" in state_dict:
            out["bias"] = np_(state_dict[f"{key}.bias"])
        return out

    def ln(key):
        return {"scale": np_(state_dict[f"{key}.weight"]), "bias": np_(state_dict[f"{key}.bias"])}

    proj = np_(state_dict["videomae.embeddings.patch_embeddings.projection.weight"])
    d = proj.shape[0]
    params: dict = {
        # (D, C, ts, p, p) -> (C, ts, p, p, D) -> (C*ts*p*p, D)
        "patch_kernel": proj.transpose(1, 2, 3, 4, 0).reshape(-1, d),
        "patch_bias": np_(state_dict["videomae.embeddings.patch_embeddings.projection.bias"]),
        "classifier": linear("classifier"),
    }
    if config.use_mean_pooling:
        params["fc_norm"] = ln("fc_norm")
    else:
        params["layernorm"] = ln("videomae.layernorm")
    for i in range(config.num_hidden_layers):
        base = f"videomae.encoder.layer.{i}"
        layer = {
            "layernorm_before": ln(f"{base}.layernorm_before"),
            "layernorm_after": ln(f"{base}.layernorm_after"),
            "attention": {
                "query": linear(f"{base}.attention.attention.query", bias=False),
                "key": linear(f"{base}.attention.attention.key", bias=False),
                "value": linear(f"{base}.attention.attention.value", bias=False),
                "output": linear(f"{base}.attention.output.dense"),
            },
            "intermediate": linear(f"{base}.intermediate.dense"),
            "output": linear(f"{base}.output.dense"),
        }
        if config.qkv_bias:
            layer["attention"]["q_bias"] = np_(state_dict[f"{base}.attention.attention.q_bias"])
            layer["attention"]["v_bias"] = np_(state_dict[f"{base}.attention.attention.v_bias"])
        params[f"layers_{i}"] = layer
    return params
