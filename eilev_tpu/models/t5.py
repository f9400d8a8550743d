"""T5 encoder-decoder LM (flax.linen), flan-t5 flavor.

Parity target: ``transformers.T5ForConditionalGeneration`` as used by the reference
for blip2-flan-t5-xl (/root/reference/eilev/model/v2.py:126,229-238). Preserved
numerics: RMS layer norm computed in fp32, no attention scaling (folded into the
weights at T5 training time), relative-position bias owned by block 0 and shared
down the stack, gated-gelu FFN with tanh-approximated gelu ("gelu_new"), untied
LM head for flan checkpoints.

Decode cache mirrors the OPT cache layout: stacked fixed-shape self-attention K/V
per layer plus encoder cross K/V projected once at decode start.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import T5Config
from ..ops.attention import dot_product_attention

Cache = dict[str, Any]


def relative_position_bucket(
    relative_position: jax.Array, *, bidirectional: bool, num_buckets: int, max_distance: int
) -> jax.Array:
    """Exact port of HF's ``T5Attention._relative_position_bucket`` semantics."""
    ret = jnp.zeros_like(relative_position)
    n = relative_position
    if bidirectional:
        num_buckets //= 2
        ret += (n > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = -jnp.minimum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    # clamp inside the log: the large-branch value is only selected when n >= max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def relative_positions(q_len: int, k_len: int, q_offset: int | jax.Array = 0) -> jax.Array:
    """memory_position - query_position, (q_len, k_len)."""
    ctx = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 0) + q_offset
    mem = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 1)
    return mem - ctx


class T5LayerNorm(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.config.layer_norm_epsilon)
        return (scale * y.astype(self.dtype)).astype(self.dtype)


class T5Attention(nn.Module):
    config: T5Config
    has_relative_attention_bias: bool = False
    bidirectional: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        inner = cfg.inner_dim
        self.q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")
        self.k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")
        self.v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")
        self.o = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="o")
        if self.has_relative_attention_bias:
            self.relative_attention_bias = nn.Embed(
                cfg.relative_attention_num_buckets,
                cfg.num_heads,
                dtype=self.dtype,
                name="relative_attention_bias",
            )

    def compute_bias(self, q_len: int, k_len: int, q_offset: int | jax.Array = 0) -> jax.Array:
        """(1, heads, q_len, k_len) relative position bias."""
        cfg = self.config
        buckets = relative_position_bucket(
            relative_positions(q_len, k_len, q_offset),
            bidirectional=self.bidirectional,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )
        values = self.relative_attention_bias(buckets)  # (q, k, heads)
        return values.transpose(2, 0, 1)[None]

    def __call__(
        self,
        hidden_states: jax.Array,
        kv_states: Optional[jax.Array] = None,
        attn: Optional[dict] = None,
        cache_kv: Optional[tuple[jax.Array, jax.Array]] = None,
        cache_index: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, Optional[tuple[jax.Array, jax.Array]]]:
        cfg = self.config
        b, s, _ = hidden_states.shape
        nh, hd = cfg.num_heads, cfg.d_kv
        kv_in = kv_states if kv_states is not None else hidden_states
        q = self.q(hidden_states).reshape(b, s, nh, hd)
        k = self.k(kv_in).reshape(b, kv_in.shape[1], nh, hd)
        v = self.v(kv_in).reshape(b, kv_in.shape[1], nh, hd)
        new_kv = None
        if cache_kv is not None and len(cache_kv) == 3:
            # stacked-buffer form: in-place row update (see models/opt.py)
            k_buf, v_buf, li = cache_kv
            k_buf = jax.lax.dynamic_update_slice(
                k_buf, k[None].astype(k_buf.dtype), (li, 0, cache_index, 0, 0)
            )
            v_buf = jax.lax.dynamic_update_slice(
                v_buf, v[None].astype(v_buf.dtype), (li, 0, cache_index, 0, 0)
            )
            new_kv = (k_buf, v_buf)
            k, v = k_buf[li], v_buf[li]
        elif cache_kv is not None:
            ck, cv = cache_kv
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
            new_kv = (ck, cv)
            k, v = ck, cv
        out = dot_product_attention(q, k, v, scale=None, **(attn or {}))  # T5: no scaling
        return self.o(out.reshape(b, s, nh * hd)), new_kv

    def cross_kv(self, encoder_hidden: jax.Array) -> tuple[jax.Array, jax.Array]:
        cfg = self.config
        b, l, _ = encoder_hidden.shape
        k = self.k(encoder_hidden).reshape(b, l, cfg.num_heads, cfg.d_kv)
        v = self.v(encoder_hidden).reshape(b, l, cfg.num_heads, cfg.d_kv)
        return k, v

    def self_classes(self, hidden: jax.Array, bias: jax.Array) -> jax.Array:
        """Causal self-attention within (B, C, L) class continuations.
        ``bias`` broadcastable to (B, C, H, L, L); no scaling (T5)."""
        cfg = self.config
        b, c, l, _ = hidden.shape
        nh, hd = cfg.num_heads, cfg.d_kv
        q = self.q(hidden).reshape(b, c, l, nh, hd)
        k = self.k(hidden).reshape(b, c, l, nh, hd)
        v = self.v(hidden).reshape(b, c, l, nh, hd)
        scores = jnp.einsum("bclhd,bcmhd->bchlm", q, k) + bias.astype(q.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bchlm,bcmhd->bclhd", probs, v)
        return self.o(ctx.reshape(b, c, l, cfg.inner_dim))

    def cross_classes(
        self, hidden: jax.Array, k: jax.Array, v: jax.Array, enc_bias: jax.Array
    ) -> jax.Array:
        """(B, C, L) class queries over the SHARED (B, S) encoder K/V — the
        encoder states are never duplicated across classes (the seq2seq analogue
        of OPTAttention.shared_prefix)."""
        cfg = self.config
        b, c, l, _ = hidden.shape
        nh, hd = cfg.num_heads, cfg.d_kv
        q = self.q(hidden).reshape(b, c, l, nh, hd)
        scores = jnp.einsum("bclhd,bshd->bchls", q, k) + enc_bias.astype(q.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bchls,bshd->bclhd", probs, v)
        return self.o(ctx.reshape(b, c, l, cfg.inner_dim))

    def shared_prefix(
        self,
        hidden: jax.Array,
        prefix_k: jax.Array,
        prefix_v: jax.Array,
        prefix_bias: jax.Array,
        self_bias: jax.Array,
    ) -> jax.Array:
        """Attention for (B, C, L) continuation tokens over a shared (B, P)
        cached decoder prefix (read-only, never duplicated across C) PLUS
        causal self-attention within each continuation — the T5 analogue of
        OPTAttention.shared_prefix (contrastive search's candidate expansion
        is this op with C = top_k, L = 1). prefix_bias broadcastable to
        (B, C, H, L, P); self_bias to (B, C, H, L, L). No scaling (T5)."""
        cfg = self.config
        b, c, l, _ = hidden.shape
        nh, hd = cfg.num_heads, cfg.d_kv
        q = self.q(hidden).reshape(b, c, l, nh, hd)
        k = self.k(hidden).reshape(b, c, l, nh, hd)
        v = self.v(hidden).reshape(b, c, l, nh, hd)
        scores_p = jnp.einsum("bclhd,bphd->bchlp", q, prefix_k) + prefix_bias.astype(q.dtype)
        scores_s = jnp.einsum("bclhd,bcmhd->bchlm", q, k) + self_bias.astype(q.dtype)
        scores = jnp.concatenate([scores_p, scores_s], axis=-1).astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(hidden.dtype)
        p = prefix_k.shape[1]
        ctx = jnp.einsum("bchlp,bphd->bclhd", probs[..., :p], prefix_v) + jnp.einsum(
            "bchlm,bcmhd->bclhd", probs[..., p:], v
        )
        return self.o(ctx.reshape(b, c, l, cfg.inner_dim))

    def cross_attend(
        self, hidden_states: jax.Array, k: jax.Array, v: jax.Array,
        padding_mask: Optional[jax.Array]
    ) -> jax.Array:
        cfg = self.config
        b, s, _ = hidden_states.shape
        q = self.q(hidden_states).reshape(b, s, cfg.num_heads, cfg.d_kv)
        out = dot_product_attention(q, k, v, padding_mask=padding_mask, scale=None)
        return self.o(out.reshape(b, s, cfg.inner_dim))


class T5FF(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.layer_norm = T5LayerNorm(cfg, dtype=self.dtype, name="layer_norm")
        if cfg.is_gated_act:
            self.wi_0 = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")
            self.wi_1 = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")
        else:
            self.wi = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi")
        self.wo = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="wo")
        self.dropout = nn.Dropout(cfg.dropout_rate)

    def _act(self, x: jax.Array) -> jax.Array:
        if self.config.dense_act_fn == "gelu_new":
            return nn.gelu(x, approximate=True)
        if self.config.dense_act_fn == "relu":
            return nn.relu(x)
        return nn.gelu(x, approximate=False)

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = self.layer_norm(x)
        if self.config.is_gated_act:
            h = self._act(self.wi_0(h)) * self.wi_1(h)
        else:
            h = self._act(self.wi(h))
        # HF T5LayerFF: inner dropout after the activation + residual dropout
        h = self.dropout(h, deterministic=deterministic)
        return x + self.dropout(self.wo(h), deterministic=deterministic)


class T5SelfAttentionLayer(nn.Module):
    config: T5Config
    has_relative_attention_bias: bool = False
    bidirectional: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.layer_norm = T5LayerNorm(self.config, dtype=self.dtype, name="layer_norm")
        self.attention = T5Attention(
            self.config,
            has_relative_attention_bias=self.has_relative_attention_bias,
            bidirectional=self.bidirectional,
            dtype=self.dtype,
            name="attention",
        )
        self.dropout = nn.Dropout(self.config.dropout_rate)

    def __call__(self, x, attn=None, cache_kv=None, cache_index=None, deterministic=True):
        h = self.layer_norm(x)
        out, new_kv = self.attention(h, attn=attn, cache_kv=cache_kv, cache_index=cache_index)
        return x + self.dropout(out, deterministic=deterministic), new_kv

    def classes(self, x, bias):
        return x + self.attention.self_classes(self.layer_norm(x), bias)

    def shared_prefix(self, x, prefix_k, prefix_v, prefix_bias, self_bias):
        return x + self.attention.shared_prefix(
            self.layer_norm(x), prefix_k, prefix_v, prefix_bias, self_bias
        )


class T5CrossAttentionLayer(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.layer_norm = T5LayerNorm(self.config, dtype=self.dtype, name="layer_norm")
        self.attention = T5Attention(self.config, bidirectional=True, dtype=self.dtype, name="attention")
        self.dropout = nn.Dropout(self.config.dropout_rate)

    def __call__(self, x, k, v, padding_mask=None, deterministic=True):
        h = self.layer_norm(x)
        out = self.attention.cross_attend(h, k, v, padding_mask)
        return x + self.dropout(out, deterministic=deterministic)

    def classes(self, x, k, v, enc_bias):
        return x + self.attention.cross_classes(self.layer_norm(x), k, v, enc_bias)

    def kv(self, encoder_hidden):
        return self.attention.cross_kv(encoder_hidden)


class T5EncoderLayer(nn.Module):
    config: T5Config
    has_relative_attention_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.self_attention = T5SelfAttentionLayer(
            self.config,
            has_relative_attention_bias=self.has_relative_attention_bias,
            bidirectional=True,
            dtype=self.dtype,
            name="self_attention",
        )
        self.ff = T5FF(self.config, dtype=self.dtype, name="ff")

    def __call__(self, x, attn, deterministic=True):
        x, _ = self.self_attention(x, attn=attn, deterministic=deterministic)
        return self.ff(x, deterministic=deterministic)


class T5DecoderLayer(nn.Module):
    config: T5Config
    has_relative_attention_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.self_attention = T5SelfAttentionLayer(
            self.config,
            has_relative_attention_bias=self.has_relative_attention_bias,
            bidirectional=False,
            dtype=self.dtype,
            name="self_attention",
        )
        self.cross_attention = T5CrossAttentionLayer(self.config, dtype=self.dtype, name="cross_attention")
        self.ff = T5FF(self.config, dtype=self.dtype, name="ff")

    def __call__(self, x, self_attn, cross_k, cross_v, cross_padding_mask,
                 cache_kv=None, cache_index=None, deterministic=True):
        x, new_kv = self.self_attention(
            x, attn=self_attn, cache_kv=cache_kv, cache_index=cache_index,
            deterministic=deterministic,
        )
        x = self.cross_attention(
            x, cross_k, cross_v, padding_mask=cross_padding_mask, deterministic=deterministic
        )
        return self.ff(x, deterministic=deterministic), new_kv

    def classes(self, x, self_bias, cross_k, cross_v, enc_bias):
        x = self.self_attention.classes(x, self_bias)
        x = self.cross_attention.classes(x, cross_k, cross_v, enc_bias)
        return self.ff(x)

    def shared_prefix(
        self, x, prefix_k, prefix_v, prefix_bias, self_bias, cross_k, cross_v, enc_bias
    ):
        x = self.self_attention.shared_prefix(x, prefix_k, prefix_v, prefix_bias, self_bias)
        x = self.cross_attention.classes(x, cross_k, cross_v, enc_bias)
        return self.ff(x)


class T5Encoder(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.layers = [
            T5EncoderLayer(
                cfg, has_relative_attention_bias=(i == 0), dtype=self.dtype, name=f"layers_{i}"
            )
            for i in range(cfg.num_layers)
        ]
        self.final_layer_norm = T5LayerNorm(cfg, dtype=self.dtype, name="final_layer_norm")
        self.dropout = nn.Dropout(cfg.dropout_rate)

    def __call__(
        self, inputs_embeds: jax.Array, attention_mask: Optional[jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        s = inputs_embeds.shape[1]
        rel_bias = self.layers[0].self_attention.attention.compute_bias(s, s)[0]  # (H, S, S)
        attn = {"bias": rel_bias, "padding_mask": attention_mask}
        x = self.dropout(inputs_embeds, deterministic=deterministic)
        if self.config.remat and not deterministic:
            # Per-layer remat for training (configs.T5Config.remat): see
            # OPTForCausalLM.__call__; guarded by tests/training/test_remat.py.
            # Gated on ``not deterministic`` (the encoder has no cache to gate
            # on, unlike OPT/T5Decoder): a remat-enabled config reused for
            # generation would otherwise wrap the inference-time encoder
            # prefill in nn.remat, whose prevent_cse=True inhibits XLA fusion.
            # Trade-off: a remat T5 trained with dropout disabled skips remat
            # too — the product recipe always trains with dropout
            # (TrainerConfig.dropout=True, matching the reference HF Trainer).
            def _layer_body(layer, h, bias, padding_mask):
                return layer(
                    h,
                    {"bias": bias, "padding_mask": padding_mask},
                    deterministic=deterministic,
                )

            remat_body = nn.remat(_layer_body)
            for layer in self.layers:
                x = remat_body(layer, x, rel_bias, attention_mask)
        else:
            for layer in self.layers:
                x = layer(x, attn, deterministic=deterministic)
        return self.dropout(self.final_layer_norm(x), deterministic=deterministic)


class T5Decoder(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.layers = [
            T5DecoderLayer(
                cfg, has_relative_attention_bias=(i == 0), dtype=self.dtype, name=f"layers_{i}"
            )
            for i in range(cfg.num_decoder_layers)
        ]
        self.final_layer_norm = T5LayerNorm(cfg, dtype=self.dtype, name="final_layer_norm")
        self.dropout = nn.Dropout(cfg.dropout_rate)

    def __call__(
        self,
        inputs_embeds: jax.Array,
        encoder_hidden: jax.Array,
        encoder_attention_mask: Optional[jax.Array],
        decoder_attention_mask: Optional[jax.Array] = None,
        cache: Optional[Cache] = None,
        deterministic: bool = True,
    ) -> tuple[jax.Array, Optional[Cache]]:
        b, s, _ = inputs_embeds.shape
        rel = self.layers[0].self_attention.attention
        if cache is None:
            self_attn = {
                "bias": rel.compute_bias(s, s)[0],
                "causal": True,
                "padding_mask": decoder_attention_mask,
            }
            cache_index = None
            if self.config.remat:
                cross = None  # computed inside the remat body instead
            else:
                cross = [layer.cross_attention.kv(encoder_hidden) for layer in self.layers]
            new_cache = None
        else:
            index = cache["index"]
            max_len = cache["k"].shape[2]
            slot_pos = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
            if "mask" in cache:
                # continuous-batching slot cache (serving/engine.py): rows
                # admitted at different times carry a PER-ROW attendable mask
                # whose dead prefix (stale positions from earlier occupants)
                # stays 0. Correctness rests on T5's relative bias being
                # translation-invariant: a row whose first real token sits at
                # cache position `index_admit` sees exactly the distances a
                # fresh cache would produce.
                written = ((slot_pos >= index) & (slot_pos < index + s)).astype(
                    cache["mask"].dtype
                )
                filled = jnp.maximum(cache["mask"], written)  # (B, max_len)
            else:
                # decode: tokens are appended strictly left to right, so
                # "filled" == "attendable" for the newest queries
                filled = (slot_pos < (index + s)).astype(jnp.int32)
            self_attn = {
                # query offset along the cache is the traced index, so fold
                # causality into the filled-slots mask
                "bias": rel.compute_bias(s, max_len, q_offset=index)[0],
                "padding_mask": filled,
            }
            cache_index = index
            cross = [(cache["cross_k"][i], cache["cross_v"][i]) for i in range(len(self.layers))]
            new_cache = dict(cache)
            new_cache["index"] = index + s
            if "mask" in cache:
                new_cache["mask"] = filled

        x = self.dropout(inputs_embeds, deterministic=deterministic)
        if cache is None and self.config.remat:
            # Per-layer remat for training; see OPTForCausalLM.__call__. The
            # cross-attention K/V projections are (re)computed inside the body
            # so only ``encoder_hidden`` itself is saved, not 2×L
            # encoder-length projections.
            def _layer_body(layer, h, bias, padding_mask, enc_hidden, enc_mask):
                ck, cv = layer.cross_attention.kv(enc_hidden)
                out, _ = layer(
                    h,
                    {"bias": bias, "causal": True, "padding_mask": padding_mask},
                    ck,
                    cv,
                    enc_mask,
                    deterministic=deterministic,
                )
                return out

            remat_body = nn.remat(_layer_body)
            for layer in self.layers:
                x = remat_body(
                    layer, x, self_attn["bias"], self_attn["padding_mask"],
                    encoder_hidden, encoder_attention_mask,
                )
            x = self.dropout(self.final_layer_norm(x), deterministic=deterministic)
            return x, None

        k_buf = cache["k"] if cache is not None else None
        v_buf = cache["v"] if cache is not None else None
        for i, layer in enumerate(self.layers):
            ck, cv = cross[i]
            ckv = (k_buf, v_buf, i) if cache is not None else None
            x, new_kv = layer(
                x, self_attn, ck, cv, encoder_attention_mask,
                cache_kv=ckv, cache_index=cache_index,
                deterministic=deterministic,
            )
            if new_kv is not None:
                k_buf, v_buf = new_kv
        x = self.dropout(self.final_layer_norm(x), deterministic=deterministic)
        if new_cache is not None:
            new_cache["k"] = k_buf
            new_cache["v"] = v_buf
        return x, new_cache

    def spec_append(
        self,
        dec_embeds: jax.Array,  # (B, s, D) — the [next_tok, d_1..d_gamma] block
        encoder_attention_mask: Optional[jax.Array],  # (B, P)
        cache: Cache,  # serving slot cache with per-row "mask"
        active: jax.Array,  # (B,) bool — gates mask writes for idle slots
    ) -> tuple[jax.Array, Cache]:
        """Multi-token cached append for PER-SLOT speculative serving.

        Two things distinguish this from the s == 1 chunked-decode branch of
        ``__call__``: intra-block causality (query ``j`` must not see drafts
        ``j+1..s-1`` written in the same pass), and a PER-ROW token-space
        relative bias. Speculative rejection leaves mask HOLES in a row's
        window, and T5's relative bias buckets by position DISTANCE — raw
        cache-slot distances are only correct while each row's live window is
        contiguous (the translation-invariance argument in ``__call__``), so
        here distances are computed over ATTENDED tokens (cumsum of the row's
        attendable mask), which collapses holes exactly as a fresh contiguous
        cache would. ``active`` gates the persisted mask so idle slots'
        writes stay unattendable; every query may attend its own position
        (softmax NaN guard for idle rows, whose outputs are discarded).
        """
        cfg = self.config
        b, s, _ = dec_embeds.shape
        index = cache["index"]
        max_len = cache["k"].shape[2]
        mask_dtype = cache["mask"].dtype
        slot_pos = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)  # (1, L)
        # ``active``: (B,) gates whole rows (the verify pass), or (B, s) gates
        # individual block positions (the evict-replay path, where one row
        # replays a right-padded token block and the pad tail must stay
        # unattendable)
        active2 = active[:, None] if active.ndim == 1 else active
        wmask = jax.lax.dynamic_update_slice(
            jnp.zeros((b, max_len), mask_dtype),
            jnp.broadcast_to(active2, (b, s)).astype(mask_dtype),
            (0, index),
        )
        filled = jnp.maximum(cache["mask"], wmask)  # (B, L)

        # token-space positions: holes collapse out of the distance metric
        tok_pos = jnp.cumsum(filled, axis=1) - 1  # (B, L)
        qpos = jax.lax.dynamic_slice(tok_pos, (0, index), (b, s))  # (B, s)
        rel = self.layers[0].self_attention.attention
        rp = tok_pos[:, None, :] - qpos[:, :, None]  # (B, s, L) mem - query
        buckets = relative_position_bucket(
            rp,
            bidirectional=False,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )
        bias = rel.relative_attention_bias(buckets)  # (B, s, L, H)
        bias = bias.transpose(0, 3, 1, 2).astype(jnp.float32)  # (B, H, s, L)
        q_slot = index + jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)  # (s, 1)
        causal_ok = slot_pos <= q_slot  # (s, L)
        self_pos = slot_pos == q_slot
        attend = ((filled[:, None, :] > 0) & causal_ok[None]) | self_pos[None]
        bias = jnp.where(attend[:, None], bias, jnp.finfo(jnp.float32).min)
        self_attn = {"bias": bias}

        new_cache = dict(cache)
        new_cache["index"] = index + s
        new_cache["mask"] = filled
        x = dec_embeds
        k_buf, v_buf = cache["k"], cache["v"]
        for i, layer in enumerate(self.layers):
            x, new_kv = layer(
                x, self_attn, cache["cross_k"][i], cache["cross_v"][i],
                encoder_attention_mask,
                cache_kv=(k_buf, v_buf, i), cache_index=index,
            )
            k_buf, v_buf = new_kv
        x = self.final_layer_norm(x)
        new_cache["k"] = k_buf
        new_cache["v"] = v_buf
        return x, new_cache

    def candidates(
        self,
        cand_embeds: jax.Array,  # (B, C, 1, D) — C candidate tokens, same position
        encoder_attention_mask: Optional[jax.Array],
        cache: Cache,
    ) -> jax.Array:
        """Contrastive-search candidate expansion over the decode cache: C
        single-token candidates all at decoder position ``index``, read-only
        against the shared self cache + cached cross K/V (no duplication, no
        commitment). Returns post-final-norm hidden (B, C, 1, D) — HF's
        ``decoder_hidden_states[-1]`` for each candidate."""
        from ..ops.attention import mask_to_bias

        b, c, l, _ = cand_embeds.shape
        index = cache["index"]
        max_len = cache["k"].shape[2]
        rel = self.layers[0].self_attention.attention
        slot_pos = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
        filled = (slot_pos < index).astype(bool)  # contiguous decode prefix
        # (1, 1, H, 1, P) relative bias for a query at token position `index`
        # + (B, 1, 1, 1, P) unfilled-slot mask
        prefix_bias = (
            rel.compute_bias(1, max_len, q_offset=index)[0][None, None].astype(jnp.float32)
            + mask_to_bias(jnp.broadcast_to(filled, (b, max_len)))[:, None, None, None, :]
        )
        # each candidate attends itself at distance 0
        self_bias = rel.compute_bias(1, 1)[0][None, None].astype(jnp.float32)
        if encoder_attention_mask is not None:
            enc_bias = mask_to_bias(encoder_attention_mask.astype(bool))[:, None, None, None, :]
        else:
            enc_bias = jnp.zeros((b, 1, 1, 1, cache["cross_k"].shape[2]), jnp.float32)

        x = cand_embeds
        for i, layer in enumerate(self.layers):
            x = layer.shared_prefix(
                x, cache["k"][i], cache["v"][i], prefix_bias, self_bias,
                cache["cross_k"][i], cache["cross_v"][i], enc_bias,
            )
        return self.final_layer_norm(x)

    def make_cross_kv(self, encoder_hidden: jax.Array) -> tuple[jax.Array, jax.Array]:
        ks, vs = [], []
        for layer in self.layers:
            k, v = layer.cross_attention.kv(encoder_hidden)
            ks.append(k)
            vs.append(v)
        return jnp.stack(ks), jnp.stack(vs)

    def score_classes(
        self,
        class_embeds: jax.Array,
        class_attention_mask: jax.Array,
        encoder_hidden: jax.Array,
        encoder_attention_mask: Optional[jax.Array],
    ) -> jax.Array:
        """Run (B, C, L) class continuations against the SHARED (B, S) encoder
        states (classify for seq2seq; the reference supports decoder-only LMs
        only, /root/reference/eilev/model/v2.py:351 — this is additive)."""
        from ..ops.attention import make_causal_bias, mask_to_bias

        b, c, l, _ = class_embeds.shape
        rel = self.layers[0].self_attention.attention
        cls_mask = class_attention_mask.astype(bool)  # (B, C, L) or (C, L)
        if cls_mask.ndim == 2:
            cls_mask = jnp.broadcast_to(cls_mask[None], (b, c, l))
        self_bias = (
            rel.compute_bias(l, l)[None].astype(jnp.float32)  # (1, 1, H, L, L)
            + make_causal_bias(l, l, dtype=jnp.float32)[None]
            + mask_to_bias(cls_mask)[:, :, None, None, :]
        )
        if encoder_attention_mask is not None:
            enc_bias = mask_to_bias(encoder_attention_mask.astype(bool))[:, None, None, None, :]
        else:
            enc_bias = jnp.zeros((b, 1, 1, 1, encoder_hidden.shape[1]), jnp.float32)

        x = class_embeds
        for layer in self.layers:
            ck, cv = layer.cross_attention.kv(encoder_hidden)
            x = layer.classes(x, self_bias, ck, cv, enc_bias)
        return self.final_layer_norm(x)


class T5ForConditionalGeneration(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.shared = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype, name="shared")
        self.encoder = T5Encoder(cfg, dtype=self.dtype, name="encoder")
        self.decoder = T5Decoder(cfg, dtype=self.dtype, name="decoder")
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head")
        else:
            self.lm_head = None

    def embed(self, input_ids: jax.Array) -> jax.Array:
        return self.shared(input_ids)

    def _head(self, hidden: jax.Array) -> jax.Array:
        if self.config.tie_word_embeddings:
            hidden = hidden * (self.config.d_model**-0.5)
            return self.shared.attend(hidden)
        return self.lm_head(hidden)

    def encode(self, inputs_embeds: jax.Array, attention_mask: Optional[jax.Array]) -> jax.Array:
        return self.encoder(inputs_embeds, attention_mask)

    # ---- pipeline-parallel plumbing (parallel/pipeline.py) ----------------
    # The encoder/decoder layer trunks run OUTSIDE flax as shard_map pipelines
    # over stacked layer params; these methods expose the pieces around them.
    # The shared relative-position biases are computed HERE (layer 0 keeps its
    # bias embedding in the non-stacked param tree) and broadcast to stages.

    def encoder_rel_bias(self, s: int) -> jax.Array:
        return self.encoder.layers[0].self_attention.attention.compute_bias(s, s)[0]

    def decoder_rel_bias(self, s: int) -> jax.Array:
        return self.decoder.layers[0].self_attention.attention.compute_bias(s, s)[0]

    def encoder_post(self, x: jax.Array) -> jax.Array:
        return self.encoder.final_layer_norm(x)

    def decoder_post(self, x: jax.Array) -> jax.Array:
        """Final decoder norm + (tied) lm head after the decoder trunk."""
        return self._head(self.decoder.final_layer_norm(x))

    def __call__(
        self,
        encoder_inputs_embeds: jax.Array,
        encoder_attention_mask: Optional[jax.Array] = None,
        decoder_input_ids: Optional[jax.Array] = None,
        decoder_attention_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        encoder_hidden = self.encoder(
            encoder_inputs_embeds, encoder_attention_mask, deterministic=deterministic
        )
        dec_embeds = self.shared(decoder_input_ids)
        hidden, _ = self.decoder(
            dec_embeds, encoder_hidden, encoder_attention_mask, decoder_attention_mask,
            deterministic=deterministic,
        )
        return self._head(hidden)

    def init_decode_cache(
        self, encoder_hidden: jax.Array, max_len: int
    ) -> Cache:
        cfg = self.config
        b = encoder_hidden.shape[0]
        cross_k, cross_v = self.decoder.make_cross_kv(encoder_hidden)
        shape = (cfg.num_decoder_layers, b, max_len, cfg.num_heads, cfg.d_kv)
        return {
            "k": jnp.zeros(shape, self.dtype),
            "v": jnp.zeros(shape, self.dtype),
            "cross_k": cross_k,
            "cross_v": cross_v,
            "index": jnp.zeros((), jnp.int32),
        }

    def score_classes(
        self,
        class_decoder_ids: jax.Array,
        class_attention_mask: jax.Array,
        encoder_hidden: jax.Array,
        encoder_attention_mask: Optional[jax.Array],
    ) -> jax.Array:
        """(B, C, L, vocab) logits for class continuations over shared encoder
        states. ``class_decoder_ids`` are already shift-righted."""
        b = encoder_hidden.shape[0]
        c, l = class_decoder_ids.shape[-2:]
        emb = self.shared(class_decoder_ids)
        if emb.ndim == 3:  # (C, L, D) shared across the batch
            emb = jnp.broadcast_to(emb[None], (b, c, l, emb.shape[-1]))
        hidden = self.decoder.score_classes(
            emb, class_attention_mask, encoder_hidden, encoder_attention_mask
        )
        return self._head(hidden)

    def decode_step(
        self,
        decoder_input_ids: jax.Array,
        encoder_hidden: jax.Array,
        encoder_attention_mask: Optional[jax.Array],
        cache: Cache,
    ) -> tuple[jax.Array, Cache]:
        dec_embeds = self.shared(decoder_input_ids)
        hidden, new_cache = self.decoder(
            dec_embeds, encoder_hidden, encoder_attention_mask, cache=cache
        )
        return self._head(hidden), new_cache

    def decode_step_hidden(
        self,
        decoder_input_ids: jax.Array,
        encoder_hidden: jax.Array,
        encoder_attention_mask: Optional[jax.Array],
        cache: Cache,
    ) -> tuple[jax.Array, jax.Array, Cache]:
        """decode_step that also returns the post-final-norm decoder hidden
        (HF ``decoder_hidden_states[-1]``) — contrastive search's context."""
        dec_embeds = self.shared(decoder_input_ids)
        hidden, new_cache = self.decoder(
            dec_embeds, encoder_hidden, encoder_attention_mask, cache=cache
        )
        return self._head(hidden), hidden, new_cache

    def candidates(
        self,
        cand_ids: jax.Array,  # (B, C) candidate tokens, same decoder position
        encoder_attention_mask: Optional[jax.Array],
        cache: Cache,
    ) -> jax.Array:
        """(B, C, D) post-final-norm hidden for C candidate continuations over
        the shared decode cache (contrastive-search expansion)."""
        emb = self.shared(cand_ids)[:, :, None, :]  # (B, C, 1, D)
        hidden = self.decoder.candidates(emb, encoder_attention_mask, cache)
        return hidden[:, :, 0]

    def decode_append(
        self,
        decoder_input_ids: jax.Array,  # (B, s) speculative verify block
        encoder_attention_mask: Optional[jax.Array],
        cache: Cache,
        active: jax.Array,  # (B,) bool
    ) -> tuple[jax.Array, Cache]:
        """Multi-token speculative verify over the serving slot cache
        (``T5Decoder.spec_append``): intra-block causal, per-row hole-aware
        relative bias."""
        dec_embeds = self.shared(decoder_input_ids)
        hidden, new_cache = self.decoder.spec_append(
            dec_embeds, encoder_attention_mask, cache, active
        )
        return self._head(hidden), new_cache
