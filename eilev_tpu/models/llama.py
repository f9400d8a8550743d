"""LLaMA-family decoder-only LM (flax.linen) with the framework's TPU KV cache.

Parity target: ``transformers.LlamaForCausalLM`` — the model the reference's
sentence-ification workloads run as Llama-2-chat
(/root/reference/scripts/ego4d/generate_std_sent.py:24-45,
/root/reference/scripts/epic-kitchens/transform_to_full_sent.py:16-36,
/root/reference/scripts/baselines/videomae/videomae_generate_full_sent.py:47-62,
/root/reference/scripts/baselines/majority/majority_generate_full_sent.py).

Numerical quirks preserved from HF Llama (eager path):
  - RMSNorm statistics in float32, weight applied after the cast back;
  - rotary embeddings computed in float32 (cos/sin of outer(pos, inv_freq));
  - scores scaled by head_dim**-0.5 AFTER the QK matmul; softmax in float32;
  - SwiGLU MLP: down(silu(gate(x)) * up(x)); no biases anywhere.

TPU-native design: same fixed-shape stacked-layer KV cache as the OPT decoder
(models/opt.py:init_cache) updated with ``lax.dynamic_update_slice`` — the
decoding loops in generation/decoding.py drive OPT and LLaMA identically. Keys
are cached post-RoPE (absolute positions), so decode steps never re-rotate the
prefix. Grouped-query attention stores only the kv heads and broadcasts at
attention time.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import LlamaConfig
from ..ops.attention import dot_product_attention
from ..ops.quantization import dense_cls

Cache = dict[str, Any]


def llama_position_ids(attention_mask: jax.Array) -> jax.Array:
    """Mask-derived positions for left-padded batches: real tokens count from 0;
    padding slots get position 1, matching HF ``prepare_inputs_for_generation``
    (their keys/queries are fully masked, the value only keeps RoPE angles sane)."""
    mask = attention_mask.astype(jnp.int32)
    pos = jnp.cumsum(mask, axis=1) - 1
    return jnp.where(mask == 0, 1, pos)


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float
) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given positions, float32, shape (..., head_dim)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, S, H, hd); cos/sin: (B, S, hd). HF rotate_half convention."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[..., None, :].astype(x.dtype)
    s = sin[..., None, :].astype(x.dtype)
    return x * c + rotated * s


class LlamaRMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        return (weight * xf.astype(self.dtype)).astype(self.dtype)


def _use_llama_decode_kernel() -> bool:
    # measured negative at the flagship decode shape (see models/opt.py) —
    # int8 caches default to XLA's materialized dequant; env-gated experiment
    import os

    from ..ops.attention import _on_tpu, get_default_attention_impl

    if not _on_tpu() or get_default_attention_impl() == "xla":
        return False
    return os.environ.get("EILEV_DECODE_KERNEL", "0") == "1"


class LlamaAttention(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        hd = cfg.head_dim
        dense = dense_cls(cfg)  # nn.Dense, or Int8Dense when opted in
        # q/k/v packed into one projection (bit-identical math — each dot
        # output column is independent; same decode weight-stream win as the
        # OPT decoder, models/opt.py). GQA: the packed output is
        # [q (nh*hd) | k (nkv*hd) | v (nkv*hd)].
        self.qkv_proj = dense(
            (cfg.num_attention_heads + 2 * cfg.num_key_value_heads) * hd,
            use_bias=False, dtype=self.dtype, name="qkv_proj",
        )
        self.o_proj = dense(
            cfg.hidden_size, use_bias=False, dtype=self.dtype, name="o_proj"
        )

    def __call__(
        self,
        hidden_states: jax.Array,
        cos: jax.Array,
        sin: jax.Array,
        attn: dict,
        cache_kv: Optional[tuple[jax.Array, jax.Array]] = None,
        cache_index: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, Optional[tuple[jax.Array, jax.Array]]]:
        cfg = self.config
        b, s, _ = hidden_states.shape
        nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        qkv = self.qkv_proj(hidden_states)
        dq, dkv = nh * hd, nkv * hd
        q = qkv[..., :dq].reshape(b, s, nh, hd)
        k = qkv[..., dq : dq + dkv].reshape(b, s, nkv, hd)
        v = qkv[..., dq + dkv :].reshape(b, s, nkv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        new_kv = None
        if cache_kv is not None and len(cache_kv) == 5:
            # stacked int8 cache: quantize post-RoPE rows, write values+scales
            from ..ops.decode_attention import dequantize_kv, quantize_kv

            k_buf, v_buf, ks_buf, vs_buf, li = cache_kv
            k8, k_sc = quantize_kv(k)
            v8, v_sc = quantize_kv(v)
            k_buf = jax.lax.dynamic_update_slice(k_buf, k8[None], (li, 0, cache_index, 0, 0))
            v_buf = jax.lax.dynamic_update_slice(v_buf, v8[None], (li, 0, cache_index, 0, 0))
            ks_buf = jax.lax.dynamic_update_slice(ks_buf, k_sc[None], (li, 0, cache_index, 0))
            vs_buf = jax.lax.dynamic_update_slice(vs_buf, v_sc[None], (li, 0, cache_index, 0))
            new_kv = (k_buf, v_buf, ks_buf, vs_buf)
            if s == 1 and _use_llama_decode_kernel():
                from ..ops.decode_attention import decode_attention_stacked

                nl, _, s_len = k_buf.shape[:3]
                out = decode_attention_stacked(
                    q.reshape(b, nh * hd),
                    k_buf.reshape(nl, b, s_len, nkv * hd),
                    v_buf.reshape(nl, b, s_len, nkv * hd),
                    attn["padding_mask"],
                    li,
                    num_heads=nh,
                    head_dim=hd,
                    kv_heads=nkv,
                    scale=hd**-0.5,
                    scale_query=False,  # HF LLaMA scales the scores
                    k_scale=ks_buf,
                    v_scale=vs_buf,
                )
                return self.o_proj(out[:, None, :]), new_kv
            # fallback (CPU tests): materialized dequant, reference numerics
            k = dequantize_kv(k_buf[li], ks_buf[li], dtype=hidden_states.dtype)
            v = dequantize_kv(v_buf[li], vs_buf[li], dtype=hidden_states.dtype)
        elif cache_kv is not None and len(cache_kv) == 3:
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

        if nkv != nh:  # grouped-query attention: broadcast kv heads
            rep = nh // nkv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        out = dot_product_attention(
            q,
            k,
            v,
            scale=hd**-0.5,
            scale_query_first=False,  # HF Llama scales the scores
            softmax_in_fp32=True,
            **attn,
        )
        return self.o_proj(out.reshape(b, s, nh * hd)), new_kv


class LlamaMLP(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        dense = dense_cls(cfg)
        self.gate_proj = dense(
            cfg.intermediate_size, use_bias=False, dtype=self.dtype, name="gate_proj"
        )
        self.up_proj = dense(
            cfg.intermediate_size, use_bias=False, dtype=self.dtype, name="up_proj"
        )
        self.down_proj = dense(
            cfg.hidden_size, use_bias=False, dtype=self.dtype, name="down_proj"
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.down_proj(nn.silu(self.gate_proj(x)) * self.up_proj(x))


class LlamaDecoderLayer(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.self_attn = LlamaAttention(cfg, dtype=self.dtype, name="self_attn")
        self.mlp = LlamaMLP(cfg, dtype=self.dtype, name="mlp")
        self.input_layernorm = LlamaRMSNorm(
            cfg.rms_norm_eps, dtype=self.dtype, name="input_layernorm"
        )
        self.post_attention_layernorm = LlamaRMSNorm(
            cfg.rms_norm_eps, dtype=self.dtype, name="post_attention_layernorm"
        )

    def __call__(
        self,
        hidden_states: jax.Array,
        cos: jax.Array,
        sin: jax.Array,
        attn: dict,
        cache_kv: Optional[tuple[jax.Array, jax.Array]] = None,
        cache_index: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, Optional[tuple[jax.Array, jax.Array]]]:
        residual = hidden_states
        x = self.input_layernorm(hidden_states)
        x, new_kv = self.self_attn(x, cos, sin, attn, cache_kv=cache_kv, cache_index=cache_index)
        x = residual + x
        return x + self.mlp(self.post_attention_layernorm(x)), new_kv


class LlamaForCausalLM(nn.Module):
    """Functional LLaMA with explicit cache input/output — same method surface
    as :class:`models.opt.OPTForCausalLM` so the compiled decoding loops
    (generation/decoding.py) drive both interchangeably."""

    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="embed_tokens"
        )
        self.layers = [
            LlamaDecoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")
            for i in range(cfg.num_hidden_layers)
        ]
        self.norm = LlamaRMSNorm(cfg.rms_norm_eps, dtype=self.dtype, name="norm")
        if not cfg.tie_word_embeddings:
            self.lm_head_dense = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head"
            )
        else:
            self.lm_head_dense = None

    def embed(self, input_ids: jax.Array) -> jax.Array:
        return self.embed_tokens(input_ids)

    def _head(self, x: jax.Array) -> jax.Array:
        x = self.norm(x)
        if self.lm_head_dense is not None:
            return self.lm_head_dense(x)
        return self.embed_tokens.attend(x)

    def __call__(
        self,
        inputs_embeds: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        position_ids: Optional[jax.Array] = None,
        cache: Optional[Cache] = None,
        deterministic: bool = True,
        cache_append: bool = False,
    ) -> tuple[jax.Array, Optional[Cache]]:
        """Same contract as OPTForCausalLM.__call__ (models/opt.py:281-295);
        ``cache_append`` marks a multi-token append into a partially filled
        cache (speculative verify blocks) — causality becomes a traced-offset
        bias like the OPT path."""
        del deterministic  # llama has no dropout in inference-serving role
        cfg = self.config
        b, s, _ = inputs_embeds.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        attention_mask = attention_mask.astype(jnp.int32)

        if cache is None:
            if position_ids is None:
                position_ids = llama_position_ids(attention_mask)
            attn = {"causal": True, "padding_mask": attention_mask}
            cache_index = None
            new_cache = None
        else:
            index = cache["index"]
            full_mask = jax.lax.dynamic_update_slice(cache["mask"], attention_mask, (0, index))
            new_counts = jnp.cumsum(attention_mask, axis=1)
            if position_ids is None:
                pos = cache["pos"][:, None] + new_counts - 1
                position_ids = jnp.where(attention_mask == 0, 1, pos)
            new_pos = cache["pos"] + new_counts[:, -1]
            if s > 1 and cache_append:
                # mid-cache multi-token append: query j sits at slot index+j
                # and may attend filled slots <= index+j (traced offset)
                from ..ops.attention import mask_to_bias

                max_len = full_mask.shape[1]
                slots = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s, max_len), 3)
                qpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s, max_len), 2)
                keep = jnp.logical_and(
                    slots <= index + qpos, full_mask[:, None, None, :].astype(bool)
                )
                attn = {"bias": mask_to_bias(keep), "causal": False}
            else:
                # see models/opt.py:316-321 for why causal is static here
                attn = {"causal": s > 1, "padding_mask": full_mask}
            cache_index = index
            new_cache = {"index": index + s, "mask": full_mask, "pos": new_pos}

        cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)
        x = inputs_embeds

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
            x, new_kv = layer(x, cos, sin, attn, cache_kv=ckv, cache_index=cache_index)
            if new_kv is not None and int8_cache:
                k_buf, v_buf, ks_buf, vs_buf = new_kv
            elif new_kv is not None:
                k_buf, v_buf = new_kv

        logits = self._head(x)
        if new_cache is not None:
            new_cache["k"] = k_buf
            new_cache["v"] = v_buf
            if int8_cache:
                new_cache["k_scale"] = ks_buf
                new_cache["v_scale"] = vs_buf
        return logits, new_cache


def convert_llama(sd, config: LlamaConfig) -> dict:
    """HF ``LlamaForCausalLM`` state dict (via models.convert._SD) -> flax params."""
    from .convert import _linear

    mdl = sd.sub("model.")
    params: dict[str, Any] = {
        "embed_tokens": {"embedding": mdl("embed_tokens.weight")},
        "norm": {"scale": mdl("norm.weight")},
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = _linear(sd, "lm_head", bias=False)
    for i in range(config.num_hidden_layers):
        lsd = mdl.sub(f"layers.{i}.")
        # q/k/v concatenate into the packed projection (see LlamaAttention)
        import numpy as _np

        qw = _linear(lsd, "self_attn.q_proj", bias=False)["kernel"]
        kw = _linear(lsd, "self_attn.k_proj", bias=False)["kernel"]
        vw = _linear(lsd, "self_attn.v_proj", bias=False)["kernel"]
        params[f"layers_{i}"] = {
            "self_attn": {
                "qkv_proj": {"kernel": _np.concatenate([qw, kw, vw], axis=1)},
                "o_proj": _linear(lsd, "self_attn.o_proj", bias=False),
            },
            "mlp": {
                "gate_proj": _linear(lsd, "mlp.gate_proj", bias=False),
                "up_proj": _linear(lsd, "mlp.up_proj", bias=False),
                "down_proj": _linear(lsd, "mlp.down_proj", bias=False),
            },
            "input_layernorm": {"scale": lsd("input_layernorm.weight")},
            "post_attention_layernorm": {"scale": lsd("post_attention_layernorm.weight")},
        }
    return params


def llama_config_from_hf(hf: dict) -> LlamaConfig:
    """Build :class:`LlamaConfig` from an HF ``config.json`` dict."""
    eos = hf.get("eos_token_id", 2)
    if isinstance(eos, list):  # llama-3 style lists
        eos = eos[0]
    return LlamaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 10000.0),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        bos_token_id=hf.get("bos_token_id", 1),
        eos_token_id=eos,
        pad_token_id=hf.get("pad_token_id") or 0,
    )
