"""Q-Former: BERT-style querying transformer with periodic cross-attention.

Parity target: ``transformers.Blip2QFormerModel`` on the query-token-only path,
which is the only path EILeV uses (reference /root/reference/eilev/model/v2.py:187-196
always calls the Q-Former with ``query_embeds`` and image ``encoder_hidden_states``,
never with text input). Post-LN BERT blocks: self-attention -> (cross-attention on
layers where ``layer_idx % cross_attention_frequency == 0``) -> query FFN.

The cross-attention KV length is time * vision_seq_len (e.g. 8 * 257 = 2056 for
8-frame clips), which is the Q-Former hot loop - it runs through the shared
:func:`dot_product_attention` so the Pallas flash path applies.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import QFormerConfig
from ..ops.attention import dot_product_attention
from ..ops.quantization import vision_dense_cls


class QFormerMultiHeadAttention(nn.Module):
    config: QFormerConfig
    is_cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        kv_states: Optional[jax.Array] = None,
        padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        kv = kv_states if kv_states is not None else hidden_states
        b, s, _ = hidden_states.shape
        l = kv.shape[1]
        dense = vision_dense_cls(cfg)
        q = dense(nh * hd, dtype=self.dtype, name="query")(hidden_states)
        k = dense(nh * hd, dtype=self.dtype, name="key")(kv)
        v = dense(nh * hd, dtype=self.dtype, name="value")(kv)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, l, nh, hd)
        v = v.reshape(b, l, nh, hd)
        out = dot_product_attention(q, k, v, padding_mask=padding_mask, scale=hd**-0.5)
        # attention-prob dropout is applied to the OUTPUT here as an equivalent
        # regularizer (flash-compatible); HF drops attention probabilities
        out = nn.Dropout(self.config.attention_probs_dropout_prob)(
            out, deterministic=deterministic
        )
        return out.reshape(b, s, nh * hd)


class QFormerSelfOutput(nn.Module):
    """dense -> residual add -> LayerNorm (post-LN BERT)."""

    config: QFormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, hidden_states: jax.Array, input_tensor: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        x = vision_dense_cls(self.config)(self.config.hidden_size, dtype=self.dtype, name="dense")(hidden_states)
        x = nn.Dropout(self.config.hidden_dropout_prob)(x, deterministic=deterministic)
        return nn.LayerNorm(use_fast_variance=False, 
            epsilon=self.config.layer_norm_eps, dtype=self.dtype, name="layer_norm"
        )(x + input_tensor)


class QFormerAttention(nn.Module):
    config: QFormerConfig
    is_cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        kv_states: Optional[jax.Array] = None,
        padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        attn_out = QFormerMultiHeadAttention(
            self.config, self.is_cross_attention, dtype=self.dtype, name="attention"
        )(hidden_states, kv_states=kv_states, padding_mask=padding_mask,
          deterministic=deterministic)
        return QFormerSelfOutput(self.config, dtype=self.dtype, name="output")(
            attn_out, hidden_states, deterministic=deterministic
        )


class QFormerFFN(nn.Module):
    """intermediate (dense+gelu) -> output (dense -> residual -> LayerNorm)."""

    config: QFormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        dense = vision_dense_cls(cfg)
        x = dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(hidden_states)
        x = nn.gelu(x, approximate=False)
        x = dense(cfg.hidden_size, dtype=self.dtype, name="output")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        return nn.LayerNorm(use_fast_variance=False, epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm")(
            x + hidden_states
        )


class QFormerLayer(nn.Module):
    config: QFormerConfig
    has_cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        encoder_padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        x = QFormerAttention(self.config, dtype=self.dtype, name="attention")(
            hidden_states, deterministic=deterministic
        )
        if self.has_cross_attention:
            assert encoder_hidden_states is not None
            x = QFormerAttention(
                self.config, is_cross_attention=True, dtype=self.dtype, name="crossattention"
            )(x, kv_states=encoder_hidden_states, padding_mask=encoder_padding_mask,
              deterministic=deterministic)
        # query-token FFN branch (intermediate_query / output_query in HF)
        return QFormerFFN(self.config, dtype=self.dtype, name="ffn_query")(
            x, deterministic=deterministic
        )


class QFormerModel(nn.Module):
    """Query-token-only Q-Former.

    ``query_embeds``: (B, num_query_tokens, hidden); ``encoder_hidden_states``:
    (B, kv_len, encoder_hidden_size); optional ``encoder_attention_mask``: (B, kv_len)
    with 1 = attend. Returns (B, num_query_tokens, hidden).
    """

    config: QFormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query_embeds: jax.Array,
        encoder_hidden_states: jax.Array,
        encoder_attention_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        x = nn.LayerNorm(use_fast_variance=False, epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layernorm")(
            query_embeds.astype(self.dtype)
        )
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        # (HF's Q-Former adds (1 - mask) * -10000; exp(-10000) == 0 in fp32, so a
        # hard key-padding mask is numerically identical.)
        for i in range(cfg.num_hidden_layers):
            has_cross = i % cfg.cross_attention_frequency == 0
            x = QFormerLayer(
                cfg, has_cross_attention=has_cross, dtype=self.dtype, name=f"layers_{i}"
            )(
                x,
                encoder_hidden_states=encoder_hidden_states if has_cross else None,
                encoder_padding_mask=encoder_attention_mask if has_cross else None,
                deterministic=deterministic,
            )
        return x
