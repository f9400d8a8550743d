"""EVA-CLIP style vision transformer (flax.linen).

Parity target: ``transformers.Blip2VisionModel`` as wrapped by the reference's
``VideoBlipVisionModel`` (/root/reference/eilev/model/v2.py:20-103). The TPU-native
video forward flattens (num_videos, channel, time, H, W) into a single big frame
batch so all frames ride one MXU-friendly matmul stream, then reshapes the outputs
back to per-video layout - same contract as the reference, but patch embedding is
expressed as an unfold+matmul (identical math to stride-p conv, better for the MXU).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import VisionConfig
from ..ops.attention import packed_qkv_self_attention
from ..ops.gelu import gelu
from ..ops.quantization import vision_dense_cls


class VisionEmbeddings(nn.Module):
    config: VisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """pixel_values: (B, 3, H, W) -> (B, 1+num_patches, hidden)."""
        cfg = self.config
        p = cfg.patch_size
        d = cfg.hidden_size
        b, c, h, w = pixel_values.shape
        gh, gw = h // p, w // p

        # Stride-p conv == unfold into patches + one matmul (exact same math;
        # keeps the FLOPs on the MXU as a single large GEMM).
        kernel = self.param(
            "patch_kernel",
            nn.initializers.normal(0.02),
            (c * p * p, d),
            jnp.float32,
        )
        bias = self.param("patch_bias", nn.initializers.zeros, (d,), jnp.float32)
        x = pixel_values.reshape(b, c, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * p * p)
        patches = (
            jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype)) + bias.astype(self.dtype)
        )

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (d,), jnp.float32
        )
        cls = jnp.broadcast_to(class_embedding.astype(self.dtype), (b, 1, d))
        embeddings = jnp.concatenate([cls, patches], axis=1)

        position_embedding = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.seq_len, d),
            jnp.float32,
        )
        return embeddings + position_embedding[None, : embeddings.shape[1]].astype(self.dtype)


class VisionAttention(nn.Module):
    config: VisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jax.Array) -> jax.Array:
        cfg = self.config
        b, s, d = hidden_states.shape
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        dense = vision_dense_cls(cfg)
        # Fused QKV projection. HF stores a single (3d, d) weight whose bias is
        # (q_bias, 0, v_bias) when qkv_bias is set.
        qkv = dense(
            3 * d, use_bias=cfg.qkv_bias, dtype=self.dtype, name="qkv"
        )(hidden_states)
        # Mask-free self-attention straight off the packed QKV output: the
        # fused TPU kernel extracts heads in VMEM (head_dim 88 is not
        # 128-lane aligned, so any HBM relayout would be lane-shuffle bound).
        out = packed_qkv_self_attention(qkv, nh, hd, scale=hd**-0.5)
        return dense(d, dtype=self.dtype, name="projection")(out)


class VisionMLP(nn.Module):
    config: VisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dense = vision_dense_cls(cfg)
        x = dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(x)
        # HF "gelu" = exact erf; ops.gelu honors the opt-in fast serving mode
        x = gelu(x)
        return dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(x)


class VisionEncoderLayer(nn.Module):
    config: VisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jax.Array) -> jax.Array:
        cfg = self.config
        residual = hidden_states
        x = nn.LayerNorm(use_fast_variance=False, epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(
            hidden_states
        )
        x = VisionAttention(cfg, dtype=self.dtype, name="self_attn")(x)
        x = x + residual
        residual = x
        y = nn.LayerNorm(use_fast_variance=False, epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        y = VisionMLP(cfg, dtype=self.dtype, name="mlp")(y)
        return y + residual


class VisionModel(nn.Module):
    """Single-frame ViT. Returns (last_hidden_state, pooler_output)."""

    config: VisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> tuple[jax.Array, jax.Array]:
        cfg = self.config
        x = VisionEmbeddings(cfg, dtype=self.dtype, name="embeddings")(pixel_values)
        for i in range(cfg.num_hidden_layers):
            x = VisionEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        post_ln = nn.LayerNorm(use_fast_variance=False, 
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="post_layernorm"
        )
        last_hidden_state = post_ln(x)
        # HF quirk: the pooler applies post_layernorm a second time to the CLS slot.
        pooler_output = post_ln(last_hidden_state[:, 0, :])
        return last_hidden_state, pooler_output


class VideoVisionModel(nn.Module):
    """Video-capable wrapper: flatten (V, C, T, H, W) over time, run the frame ViT,
    then unflatten - matching reference ``VideoBlipVisionModel.forward``
    (/root/reference/eilev/model/v2.py:24-103).

    Returns:
      last_hidden_state: (V, T * S, D)
      pooler_output: (V, T, D)
    """

    config: VisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> tuple[jax.Array, jax.Array]:
        v, c, t, h, w = pixel_values.shape
        flat = pixel_values.transpose(0, 2, 1, 3, 4).reshape(v * t, c, h, w)
        last_hidden, pooled = VisionModel(self.config, dtype=self.dtype, name="vision")(flat)
        s = last_hidden.shape[1]
        d = last_hidden.shape[2]
        return last_hidden.reshape(v, t * s, d), pooled.reshape(v, t, d)
