"""OPT decoder-only language model (flax.linen) with a TPU-native KV cache.

Parity target: ``transformers.OPTForCausalLM`` (the LM inside
``VideoBlipForConditionalGeneration``, reference /root/reference/eilev/model/v2.py:124).

Numerical quirks preserved from HF OPT:
  - learned positional embeddings with offset 2, positions derived from the
    attention-mask cumsum (``cumsum(mask) * mask - 1``), which makes left-padded
    batches decode identically to unpadded ones;
  - query scaled by head_dim**-0.5 *before* the QK matmul;
  - softmax computed in float32;
  - masking with the dtype's most-negative finite value (not -inf).

TPU-native design choices (not ports):
  - The KV cache is a single pytree of fixed-shape arrays stacked over layers,
    updated with ``lax.dynamic_update_slice`` - jit/pjit friendly, shardable over
    (data, heads) mesh axes.
  - ``classify``-style scoring attends class continuations against a *shared*
    prompt cache with an extra class dimension instead of ``repeat_interleave``-ing
    the cache (reference v2.py:457-459 materializes batch*num_classes KV copies; we
    materialize none - only the (B, C, H, L, P) score tile, which is small because
    class sequences are short).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import OPTConfig
from ..ops.attention import (
    dot_product_attention,
    make_causal_bias,
    mask_to_bias,
)
from ..ops.fused_attention import packed_qkv_causal_attention
from ..ops.quantization import dense_cls


def _use_fused_causal() -> bool:
    """Packed causal kernel eligibility: TPU backend + a kernel-friendly
    attention impl selected (mirrors ops.attention dispatch)."""
    from ..ops.attention import _on_tpu, get_default_attention_impl

    return _on_tpu() and get_default_attention_impl() in ("auto", "fused", "flash")


# Decode-attention Pallas kernel switches — MEASURED NEGATIVE at the flagship
# decode shape (docs/PERF.md round 3): the per-head lane extraction that is
# amortized by real MXU work in the prefill/ViT kernels dominates a
# single-query step (bf16 kernel 119 ms/step, int8 81, vs 10.46 XLA). Both
# default OFF; int8 caches read through XLA's materialized dequant (2.9 vs
# 3.4 ms cache read, and the full HBM-capacity halving either way). The
# kernels remain env-selectable for future shapes.
_BF16_DECODE_KERNEL = os.environ.get("EILEV_BF16_DECODE_KERNEL", "0") == "1"
_INT8_DECODE_KERNEL = os.environ.get("EILEV_DECODE_KERNEL", "0") == "1"


def _use_decode_kernel(bf16: bool = False) -> bool:
    from ..ops.attention import _on_tpu, get_default_attention_impl

    if not _on_tpu() or get_default_attention_impl() == "xla":
        return False
    return _BF16_DECODE_KERNEL if bf16 else _INT8_DECODE_KERNEL

Cache = dict[str, Any]


def opt_position_ids(attention_mask: jax.Array) -> jax.Array:
    """HF OPT position ids: cumsum(mask) * mask - 1 (padding gets -1, which maps to
    embedding row 1 after the +2 offset, exactly like torch)."""
    mask = attention_mask.astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask - 1


def init_cache(config, batch: int, max_len: int, dtype=jnp.float32) -> Cache:
    """Preallocate a fixed-shape KV cache (shared by OPT and LLaMA decoders).

    Layout: k/v are (num_layers, batch, max_len, num_kv_heads, head_dim). ``index``
    is the number of filled positions; ``mask`` carries the 0/1 attention mask of
    the filled prefix (so left padding inside the prompt keeps masking during
    decode); ``pos`` is the next position id per sequence (count of attended
    tokens so far).

    With ``config.int8_kv_cache`` (serving mode) k/v are int8 and per-(position,
    head) bf16 dequant scales ride in ``k_scale``/``v_scale``; the decode step
    reads them through the Pallas kernel in ops/decode_attention.py, which
    dequantizes in VMEM (halving the cache HBM stream — the win XLA's
    materialized dequant loses, docs/PERF.md).
    """
    kv_heads = getattr(config, "num_key_value_heads", config.num_attention_heads)
    shape = (config.num_hidden_layers, batch, max_len, kv_heads, config.head_dim)
    cache: Cache = {
        "index": jnp.zeros((), jnp.int32),
        "mask": jnp.zeros((batch, max_len), jnp.int32),
        "pos": jnp.zeros((batch,), jnp.int32),
    }
    if getattr(config, "int8_kv_cache", False):
        cache["k"] = jnp.zeros(shape, jnp.int8)
        cache["v"] = jnp.zeros(shape, jnp.int8)
        cache["k_scale"] = jnp.zeros(shape[:-1], jnp.bfloat16)
        cache["v_scale"] = jnp.zeros(shape[:-1], jnp.bfloat16)
    else:
        cache["k"] = jnp.zeros(shape, dtype)
        cache["v"] = jnp.zeros(shape, dtype)
    return cache


class OPTAttention(nn.Module):
    config: OPTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        d = self.config.hidden_size
        dense = dense_cls(self.config)  # nn.Dense, or Int8Dense when opted in
        # q/k/v PACKED into one projection: one GEMM/GEMV instead of three.
        # Bit-identical to HF's separate projections (each output column of a
        # dot is computed independently); the converter concatenates the HF
        # kernels [q|k|v] and the exporter splits them back. Cuts ~3 ms off
        # the weight-stream-bound decode step (docs/PERF.md).
        self.qkv_proj = dense(3 * d, dtype=self.dtype, name="qkv_proj")
        self.out_proj = dense(d, dtype=self.dtype, name="out_proj")

    def __call__(
        self,
        hidden_states: jax.Array,
        attn: dict,
        cache_kv: Optional[tuple] = None,
        cache_index: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, Optional[tuple]]:
        """``cache_kv`` is either (k, v) per-layer buffers of shape
        (B, L, H, hd), or (k_buf, v_buf, layer_idx) STACKED buffers of shape
        (num_layers, B, L, H, hd) updated in place with one dynamic_update_slice
        — the stacked form avoids the slice+restack full-cache copy per decode
        step (the carried buffer aliases in place under the while_loop). With an
        int8 cache the stacked form is (k_buf, v_buf, k_scale, v_scale,
        layer_idx) and the single-token decode read goes through the Pallas
        kernel in ops/decode_attention.py (dequant in VMEM)."""
        cfg = self.config
        b, s, d = hidden_states.shape
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        qkv = self.qkv_proj(hidden_states)
        q = qkv[..., :d].reshape(b, s, nh, hd)
        k = qkv[..., d : 2 * d].reshape(b, s, nh, hd)
        v = qkv[..., 2 * d :].reshape(b, s, nh, hd)
        prefill_fresh = attn.get("prefill_fresh", False)

        new_kv = None
        if cache_kv is not None and len(cache_kv) == 5:
            # stacked int8 cache: quantize the fresh rows, write values+scales
            from ..ops.decode_attention import dequantize_kv, quantize_kv

            k_buf, v_buf, ks_buf, vs_buf, li = cache_kv
            k8, k_sc = quantize_kv(k)
            v8, v_sc = quantize_kv(v)
            k_buf = jax.lax.dynamic_update_slice(
                k_buf, k8[None], (li, 0, cache_index, 0, 0)
            )
            v_buf = jax.lax.dynamic_update_slice(
                v_buf, v8[None], (li, 0, cache_index, 0, 0)
            )
            ks_buf = jax.lax.dynamic_update_slice(
                ks_buf, k_sc[None], (li, 0, cache_index, 0)
            )
            vs_buf = jax.lax.dynamic_update_slice(
                vs_buf, v_sc[None], (li, 0, cache_index, 0)
            )
            new_kv = (k_buf, v_buf, ks_buf, vs_buf)
            if not prefill_fresh:
                if s == 1 and _use_decode_kernel():
                    out = self._decode_kernel_out(
                        qkv, k_buf, v_buf, attn["padding_mask"], li,
                        k_scale=ks_buf, v_scale=vs_buf,
                    )
                    return self.out_proj(out), new_kv
                # fallback (CPU tests): materialized dequant, reference numerics
                k = dequantize_kv(k_buf[li], ks_buf[li], dtype=hidden_states.dtype)
                v = dequantize_kv(v_buf[li], vs_buf[li], dtype=hidden_states.dtype)
        elif cache_kv is not None and len(cache_kv) == 3:
            k_buf, v_buf, li = cache_kv
            k_buf = jax.lax.dynamic_update_slice(
                k_buf, k[None].astype(k_buf.dtype), (li, 0, cache_index, 0, 0)
            )
            v_buf = jax.lax.dynamic_update_slice(
                v_buf, v[None].astype(v_buf.dtype), (li, 0, cache_index, 0, 0)
            )
            new_kv = (k_buf, v_buf)
            if not prefill_fresh:
                if s == 1 and _use_decode_kernel(bf16=True):
                    out = self._decode_kernel_out(
                        qkv, k_buf, v_buf, attn["padding_mask"], li
                    )
                    return self.out_proj(out), new_kv
                k, v = k_buf[li], v_buf[li]
        elif cache_kv is not None:
            ck, cv = cache_kv
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
            new_kv = (ck, cv)
            if not prefill_fresh:
                k, v = ck, cv

        if prefill_fresh and _use_fused_causal():
            # generation prefill (never differentiated): packed causal kernel,
            # scores stay in VMEM (ops/fused_attention.py)
            out = packed_qkv_causal_attention(
                qkv, nh, hd, attn["padding_mask"], scale=hd**-0.5
            )
            return self.out_proj(out), new_kv

        attn_kwargs = {key: val for key, val in attn.items() if key != "prefill_fresh"}
        out = dot_product_attention(
            q,
            k,
            v,
            scale=hd**-0.5,
            scale_query_first=True,  # HF OPT scales q before the matmul
            softmax_in_fp32=True,
            **attn_kwargs,
        )
        out = out.reshape(b, s, d)
        return self.out_proj(out), new_kv

    def _decode_kernel_out(
        self, qkv, k_buf, v_buf, padding_mask, li,
        k_scale=None, v_scale=None,
    ) -> jax.Array:
        """Single-token decode attention through the Pallas stacked-cache
        kernel (ops/decode_attention.py). Returns (B, 1, D)."""
        from ..ops.decode_attention import decode_attention_stacked

        cfg = self.config
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        d = nh * hd
        b = qkv.shape[0]
        nl, _, s_len = k_buf.shape[:3]
        out = decode_attention_stacked(
            qkv[:, 0, :d],
            k_buf.reshape(nl, b, s_len, d),
            v_buf.reshape(nl, b, s_len, d),
            padding_mask,
            li,
            num_heads=nh,
            head_dim=hd,
            scale=hd**-0.5,
            k_scale=k_scale,
            v_scale=v_scale,
        )
        return out[:, None, :]

    def shared_prefix(
        self,
        hidden_states: jax.Array,
        prefix_k: jax.Array,
        prefix_v: jax.Array,
        prefix_bias: jax.Array,
        self_bias: jax.Array,
    ) -> jax.Array:
        """Attention for (B, C, L, D) class tokens over a shared (B, P) prompt cache.

        prefix_bias: broadcastable to (B, C, H, L, P); self_bias: to (B, C, H, L, L).
        """
        cfg = self.config
        b, c, l, d = hidden_states.shape
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        scale = hd**-0.5
        qkv = self.qkv_proj(hidden_states)
        q = (qkv[..., :d] * scale).reshape(b, c, l, nh, hd)
        k = qkv[..., d : 2 * d].reshape(b, c, l, nh, hd)
        v = qkv[..., 2 * d :].reshape(b, c, l, nh, hd)
        # (B, C, H, L, P): queries against the shared prompt keys
        scores_p = jnp.einsum("bclhd,bphd->bchlp", q, prefix_k) + prefix_bias
        # (B, C, H, L, L): causal self-attention within each class continuation
        scores_s = jnp.einsum("bclhd,bcmhd->bchlm", q, k) + self_bias
        scores = jnp.concatenate([scores_p, scores_s], axis=-1).astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(hidden_states.dtype)
        p_len = prefix_k.shape[1]
        ctx = jnp.einsum("bchlp,bphd->bclhd", probs[..., :p_len], prefix_v) + jnp.einsum(
            "bchlm,bcmhd->bclhd", probs[..., p_len:], v
        )
        return self.out_proj(ctx.reshape(b, c, l, d))


class OPTDecoderLayer(nn.Module):
    config: OPTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.self_attn = OPTAttention(cfg, dtype=self.dtype, name="self_attn")
        self.self_attn_layer_norm = nn.LayerNorm(use_fast_variance=False, 
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="self_attn_layer_norm"
        )
        self.final_layer_norm = nn.LayerNorm(use_fast_variance=False, 
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm"
        )
        dense = dense_cls(cfg)
        self.fc1 = dense(cfg.ffn_dim, dtype=self.dtype, name="fc1")
        self.fc2 = dense(cfg.hidden_size, dtype=self.dtype, name="fc2")
        self.dropout_layer = nn.Dropout(cfg.dropout)

    def _act(self, x: jax.Array) -> jax.Array:
        if self.config.activation_function == "relu":
            return nn.relu(x)
        return nn.gelu(x, approximate=False)

    def _mlp(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        residual = x
        if cfg.do_layer_norm_before:
            x = self.final_layer_norm(x)
        x = self.fc2(self._act(self.fc1(x)))
        x = self.dropout_layer(x, deterministic=deterministic)
        x = residual + x
        if not cfg.do_layer_norm_before:
            x = self.final_layer_norm(x)
        return x

    def __call__(
        self,
        hidden_states: jax.Array,
        attn: dict,
        cache_kv: Optional[tuple[jax.Array, jax.Array]] = None,
        cache_index: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> tuple[jax.Array, Optional[tuple[jax.Array, jax.Array]]]:
        cfg = self.config
        residual = hidden_states
        x = hidden_states
        if cfg.do_layer_norm_before:
            x = self.self_attn_layer_norm(x)
        x, new_kv = self.self_attn(x, attn, cache_kv=cache_kv, cache_index=cache_index)
        x = self.dropout_layer(x, deterministic=deterministic)
        x = residual + x
        if not cfg.do_layer_norm_before:
            x = self.self_attn_layer_norm(x)
        return self._mlp(x, deterministic=deterministic), new_kv

    def shared_prefix(
        self,
        hidden_states: jax.Array,
        prefix_k: jax.Array,
        prefix_v: jax.Array,
        prefix_bias: jax.Array,
        self_bias: jax.Array,
    ) -> jax.Array:
        cfg = self.config
        residual = hidden_states
        x = hidden_states
        if cfg.do_layer_norm_before:
            x = self.self_attn_layer_norm(x)
        x = self.self_attn.shared_prefix(x, prefix_k, prefix_v, prefix_bias, self_bias)
        x = residual + x
        if not cfg.do_layer_norm_before:
            x = self.self_attn_layer_norm(x)
        return self._mlp(x)


class OPTForCausalLM(nn.Module):
    """Functional OPT with explicit cache input/output.

    Methods (all reachable via ``module.apply(..., method=...)``):
      - ``embed``: token ids -> input embeddings (word_embed_proj_dim space).
      - ``__call__``: forward. With ``cache``, writes K/V at ``cache['index']`` and
        attends over the whole cache; else plain causal attention. Returns
        (logits, new_cache).
      - ``score_with_prefix``: classify-style scoring against a shared prompt cache.
    """

    config: OPTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.word_embed_proj_dim, dtype=self.dtype, name="embed_tokens"
        )
        # +2 offset slots, like torch's OPTLearnedPositionalEmbedding
        self.embed_positions = nn.Embed(
            cfg.max_position_embeddings + 2,
            cfg.hidden_size,
            dtype=self.dtype,
            name="embed_positions",
        )
        if cfg.word_embed_proj_dim != cfg.hidden_size:
            self.project_in = nn.Dense(
                cfg.hidden_size, use_bias=False, dtype=self.dtype, name="project_in"
            )
            self.project_out = nn.Dense(
                cfg.word_embed_proj_dim, use_bias=False, dtype=self.dtype, name="project_out"
            )
        else:
            self.project_in = None
            self.project_out = None
        self.layers = [
            OPTDecoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")
            for i in range(cfg.num_hidden_layers)
        ]
        self.embed_dropout = nn.Dropout(cfg.dropout)
        if cfg.do_layer_norm_before:
            self.final_norm = nn.LayerNorm(use_fast_variance=False, 
                epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_norm"
            )
        else:
            self.final_norm = None

    def embed(self, input_ids: jax.Array) -> jax.Array:
        return self.embed_tokens(input_ids)

    # ---- pipeline-parallel plumbing (parallel/pipeline.py) ----------------
    # The layer trunk runs OUTSIDE flax as a shard_map pipeline over stacked
    # layer params; these two methods expose everything around it.

    def pre_layers(self, inputs_embeds: jax.Array, attention_mask: jax.Array) -> jax.Array:
        """Everything __call__ does before the layer stack (no cache, no
        dropout — the PP trunk runs the frozen LM deterministically)."""
        position_ids = opt_position_ids(attention_mask.astype(jnp.int32))
        pos_embeds = self.embed_positions(position_ids + 2)
        x = inputs_embeds
        if self.project_in is not None:
            x = self.project_in(x)
        return x + pos_embeds

    def post_layers(self, x: jax.Array) -> jax.Array:
        """Final norm + projection + tied lm head after the layer stack."""
        return self._head(x)

    def lm_head(self, hidden: jax.Array) -> jax.Array:
        # Tied to embed_tokens, like OPTForCausalLM.
        return self.embed_tokens.attend(hidden)

    def _pre_head(self, x: jax.Array) -> jax.Array:
        """Final norm + out-projection WITHOUT the lm head — HF's
        ``hidden_states[-1]`` for OPT (modeling_opt.py applies
        final_layer_norm then project_out before recording the last hidden
        state), the vector contrastive search scores candidates with."""
        if self.final_norm is not None:
            x = self.final_norm(x)
        if self.project_out is not None:
            x = self.project_out(x)
        return x

    def _head(self, x: jax.Array) -> jax.Array:
        return self.lm_head(self._pre_head(x))

    def __call__(
        self,
        inputs_embeds: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        position_ids: Optional[jax.Array] = None,
        cache: Optional[Cache] = None,
        deterministic: bool = True,
        cache_append: bool = False,
        with_hidden: bool = False,
    ) -> tuple:
        """inputs_embeds: (B, S, word_embed_proj_dim).

        ``with_hidden=True`` additionally returns the final hidden states
        (post final-norm/out-projection, HF ``hidden_states[-1]``) as
        ``(logits, hidden, new_cache)`` — contrastive search's context
        representation.

        Without cache: ``attention_mask`` is the (B, S) padding mask, positions
        derived HF-style. With cache: the S tokens are appended at
        ``cache['index']``; ``attention_mask`` is their (B, S) mask (default ones);
        padding of the already-cached prefix is tracked inside the cache.

        ``cache_append=True`` marks a MULTI-token append into a partially
        filled cache (speculative-decoding verify blocks): each appended query
        j attends cache slots < index + j + 1 via a traced-offset causal bias,
        instead of the prefill-at-0 fast path.
        """
        cfg = self.config
        b, s, _ = inputs_embeds.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        attention_mask = attention_mask.astype(jnp.int32)

        if cache is None:
            if position_ids is None:
                position_ids = opt_position_ids(attention_mask)
            attn = {"causal": True, "padding_mask": attention_mask}
            cache_index = None
            new_cache = None
        else:
            index = cache["index"]
            full_mask = jax.lax.dynamic_update_slice(cache["mask"], attention_mask, (0, index))
            new_counts = jnp.cumsum(attention_mask, axis=1)
            if position_ids is None:
                position_ids = (cache["pos"][:, None] + new_counts) * attention_mask - 1
            new_pos = cache["pos"] + new_counts[:, -1]
            # Padding mask over the whole cache kills unwritten slots (mask 0).
            # Multi-token writes (s > 1) only happen at prefill into a fresh
            # cache in this framework, so the causal query offset is statically
            # 0; single-token decode needs no causal mask (the newest token may
            # attend everything filled).
            if s > 1 and cache_append:
                # mid-cache multi-token append (speculative verify): query j
                # sits at slot index+j and may attend filled slots <= index+j.
                # index is traced, so causality folds into one additive bias.
                max_len = full_mask.shape[1]
                slots = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s, max_len), 3)
                qpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s, max_len), 2)
                keep = jnp.logical_and(
                    slots <= index + qpos, full_mask[:, None, None, :].astype(bool)
                )
                attn = {"bias": mask_to_bias(keep), "causal": False}
            elif s > 1:
                # prefill-at-0: attending the fresh (B, S) k/v under the short
                # mask is identical math to attending the padded cache buffers
                # (unfilled slots are masked out either way), and it lets the
                # layer run the packed causal Pallas kernel — the fp32 score
                # tensor never touches HBM (ops/fused_attention.py)
                attn = {
                    "causal": True,
                    "padding_mask": attention_mask,
                    "prefill_fresh": True,
                }
            else:
                attn = {"causal": False, "padding_mask": full_mask}
            cache_index = index
            new_cache = {"index": index + s, "mask": full_mask, "pos": new_pos}

        pos_embeds = self.embed_positions(position_ids + 2)
        x = inputs_embeds
        if self.project_in is not None:
            x = self.project_in(x)
        x = x + pos_embeds
        x = self.embed_dropout(x, deterministic=deterministic)

        # stacked-buffer cache threading: each layer dynamic-update-slices its
        # row of the (L, B, S, H, hd) buffers in place (no slice+restack copy).
        # int8 caches additionally thread the per-(position, head) scale bufs.
        if cache is None and cfg.remat:
            # Per-layer remat for the training forward (configs.OPTConfig.remat):
            # only the (B, S, H) layer boundaries are saved for backward; the
            # attention scores / MLP intermediates inside each layer are
            # recomputed. flax's lifted remat replays the dropout rng, so the
            # step is numerically identical to the unremat'd one (guarded by
            # tests/training/test_remat.py).
            def _layer_body(layer, h, padding_mask):
                out, _ = layer(
                    h,
                    {"causal": True, "padding_mask": padding_mask},
                    deterministic=deterministic,
                )
                return out

            remat_body = nn.remat(_layer_body)
            for layer in self.layers:
                x = remat_body(layer, x, attention_mask)
            if with_hidden:
                hidden = self._pre_head(x)
                return self.lm_head(hidden), hidden, None
            return self._head(x), None

        k_buf = cache["k"] if cache is not None else None
        v_buf = cache["v"] if cache is not None else None
        int8_cache = cache is not None and "k_scale" in cache
        ks_buf = cache["k_scale"] if int8_cache else None
        vs_buf = cache["v_scale"] if int8_cache else None
        for i, layer in enumerate(self.layers):
            if cache is None:
                ckv = None
            elif int8_cache:
                ckv = (k_buf, v_buf, ks_buf, vs_buf, i)
            else:
                ckv = (k_buf, v_buf, i)
            x, new_kv = layer(
                x, attn, cache_kv=ckv, cache_index=cache_index,
                deterministic=deterministic,
            )
            if new_kv is not None and int8_cache:
                k_buf, v_buf, ks_buf, vs_buf = new_kv
            elif new_kv is not None:
                k_buf, v_buf = new_kv

        hidden = self._pre_head(x)
        logits = self.lm_head(hidden)
        if new_cache is not None:
            new_cache["k"] = k_buf
            new_cache["v"] = v_buf
            if int8_cache:
                new_cache["k_scale"] = ks_buf
                new_cache["v_scale"] = vs_buf
        if with_hidden:
            return logits, hidden, new_cache
        return logits, new_cache

    def score_with_prefix(
        self,
        class_embeds: jax.Array,
        class_attention_mask: jax.Array,
        cache: Cache,
        return_hidden: bool = False,
    ) -> jax.Array:
        """Run (B, C, L) class continuations against a shared (B,) prompt cache.

        Returns logits of shape (B, C, L, vocab). The prompt cache is read-only and
        never duplicated across classes. ``return_hidden=True`` also returns
        the final hidden states (B, C, L, D) — contrastive search's candidate
        expansion is exactly this op with C=top_k single-token continuations.
        """
        b, c, l, _ = class_embeds.shape
        cls_mask = class_attention_mask.astype(jnp.int32)  # (B, C, L)

        # positions continue per batch from the prompt
        position_ids = (
            cache["pos"][:, None, None] + jnp.cumsum(cls_mask, axis=-1)
        ) * cls_mask - 1
        pos_embeds = self.embed_positions(position_ids + 2)

        x = class_embeds
        if self.project_in is not None:
            x = self.project_in(x)
        x = x + pos_embeds

        # (B, 1, 1, 1, P) prompt padding/unfilled-slot bias
        prefix_bias = mask_to_bias(cache["mask"].astype(bool))[:, None, None, None, :]
        # (1, 1, 1, L, L) causal + (B, C, 1, 1, L) class padding
        self_bias = (
            make_causal_bias(l, l, dtype=jnp.float32)[None]  # (1,1,1,L,L)
            + mask_to_bias(cls_mask.astype(bool))[:, :, None, None, :]
        )

        int8_cache = "k_scale" in cache
        if int8_cache:
            # int8-KV serving mode: dequantize the shared prompt cache on the
            # read side (materialized, like the decode fallback — the prompt
            # cache is read C times per classify call, so the halved HBM
            # footprint is what matters at the 188/793-class ICL eval shapes)
            from ..ops.decode_attention import dequantize_kv

        for i, layer in enumerate(self.layers):
            if int8_cache:
                pk = dequantize_kv(cache["k"][i], cache["k_scale"][i], dtype=x.dtype)
                pv = dequantize_kv(cache["v"][i], cache["v_scale"][i], dtype=x.dtype)
            else:
                pk, pv = cache["k"][i], cache["v"][i]
            x = layer.shared_prefix(x, pk, pv, prefix_bias, self_bias)
        hidden = self._pre_head(x)
        logits = self.lm_head(hidden)
        if return_hidden:
            return logits, hidden
        return logits
