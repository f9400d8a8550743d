"""Torch-free bidirectional text encoders for the model-based quality metrics.

The reference's metric suite (/root/reference/scripts/general/generation_eval.py:14-72)
runs three pretrained encoders through torch/sentence-transformers:
  - STS bi-encoder: ``all-mpnet-base-v2`` (MPNet, mean pooling, cosine),
  - STS cross-encoder: ``cross-encoder/stsb-roberta-large`` (RoBERTa +
    regression head, sigmoid),
  - BERTScore: greedy token matching over contextual embeddings
    (torchmetrics default model: roberta-large).

This module implements all three model families (BERT / RoBERTa / MPNet share
one post-LayerNorm encoder body; MPNet adds a shared relative-attention bias,
RoBERTa/MPNet offset positions past the padding idx) in flax with converters
from local HF safetensors, so the published quality table can be reproduced
without torch or Hub egress. Numerics match the HF eager implementations in
fp32 (tests/eval/test_encoder.py uses tiny random HF oracles).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.t5 import relative_position_bucket


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    model_type: str = "bert"  # bert | roberta | mpnet
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    relative_attention_num_buckets: int = 32  # mpnet
    hidden_act: str = "gelu"
    num_labels: int = 0  # >0 adds the sequence-classification head (cross-encoder)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def encoder_config_from_hf(hf: dict, *, num_labels: int = 0) -> EncoderConfig:
    return EncoderConfig(
        model_type=hf.get("model_type", "bert"),
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf.get("max_position_embeddings", 512),
        type_vocab_size=hf.get("type_vocab_size", 2),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-12),
        pad_token_id=hf.get("pad_token_id", 1 if hf.get("model_type") in ("roberta", "mpnet") else 0),
        relative_attention_num_buckets=hf.get("relative_attention_num_buckets", 32),
        hidden_act=hf.get("hidden_act", "gelu"),
        num_labels=num_labels,
    )


class _SelfAttention(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x, mask_bias, position_bias):
        cfg = self.config
        b, s, d = x.shape
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        q = nn.Dense(d, name="query")(x).reshape(b, s, nh, hd)
        k = nn.Dense(d, name="key")(x).reshape(b, s, nh, hd)
        v = nn.Dense(d, name="value")(x).reshape(b, s, nh, hd)
        scores = jnp.einsum("bshd,blhd->bhsl", q, k) / jnp.sqrt(float(hd))
        if position_bias is not None:
            scores = scores + position_bias
        scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhsl,blhd->bshd", probs, v).reshape(b, s, d)
        return nn.Dense(d, name="dense")(ctx)


class _Layer(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x, mask_bias, position_bias):
        cfg = self.config
        attn_out = _SelfAttention(cfg, name="attention")(x, mask_bias, position_bias)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False,
                         name="attention_layer_norm")(x + attn_out)
        h = nn.Dense(cfg.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, name="output")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False,
                            name="output_layer_norm")(x + h)


class TextEncoder(nn.Module):
    """BERT/RoBERTa/MPNet body. Returns all hidden states (num_layers+1, B, S, D)
    so BERTScore can pick its per-model layer."""

    config: EncoderConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        cfg = self.config
        b, s = input_ids.shape
        mask = attention_mask.astype(jnp.int32)

        if cfg.model_type in ("roberta", "mpnet"):
            # HF create_position_ids_from_input_ids: past the padding idx
            positions = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id
        else:
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))

        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings")(input_ids)
        x = x + nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, name="position_embeddings"
        )(positions)
        if cfg.model_type in ("bert", "roberta"):
            x = x + nn.Embed(cfg.type_vocab_size, cfg.hidden_size, name="token_type_embeddings")(
                jnp.zeros_like(input_ids)
            )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False,
                         name="embeddings_layer_norm")(x)

        mask_bias = jnp.where(mask.astype(bool), 0.0, jnp.finfo(jnp.float32).min)[:, None, None, :]

        position_bias = None
        if cfg.model_type == "mpnet":
            # shared relative-attention bias table (MPNetEncoder.compute_position_bias)
            ctx = jnp.arange(s)[:, None]
            mem = jnp.arange(s)[None, :]
            buckets = relative_position_bucket(
                mem - ctx,
                bidirectional=True,
                num_buckets=cfg.relative_attention_num_buckets,
                max_distance=128,
            )
            table = nn.Embed(
                cfg.relative_attention_num_buckets,
                cfg.num_attention_heads,
                name="relative_attention_bias",
            )(buckets)  # (S, S, H)
            position_bias = table.transpose(2, 0, 1)[None]  # (1, H, S, S)

        hiddens = [x]
        for i in range(cfg.num_hidden_layers):
            x = _Layer(cfg, name=f"layers_{i}")(x, mask_bias, position_bias)
            hiddens.append(x)
        return jnp.stack(hiddens)


class CrossEncoderModel(nn.Module):
    """RoBERTa sequence-classification head over the first token — the
    cross-encoder path (sentence-transformers CrossEncoder semantics:
    sigmoid for num_labels == 1)."""

    config: EncoderConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        cfg = self.config
        hidden = TextEncoder(cfg, name="encoder")(input_ids, attention_mask)[-1]
        x = hidden[:, 0]
        x = nn.Dense(cfg.hidden_size, name="classifier_dense")(x)
        x = jnp.tanh(x)
        logits = nn.Dense(cfg.num_labels, name="classifier_out_proj")(x)
        if cfg.num_labels == 1:
            return jax.nn.sigmoid(logits[:, 0])
        return logits


# ---------------------------------------------------------------------------
# HF state-dict conversion
# ---------------------------------------------------------------------------


def convert_encoder(sd: dict[str, Any], cfg: EncoderConfig) -> dict:
    """HF BertModel / RobertaModel / MPNetModel (optionally *ForSequenceClassification)
    state dict -> TextEncoder params."""

    def np_(k):
        v = sd[k]
        return v.detach().cpu().float().numpy() if hasattr(v, "detach") else np.asarray(v)

    # *ForSequenceClassification prefixes the body with the model type
    prefix = ""
    for p in (f"{cfg.model_type}.", "bert.", "roberta.", "mpnet.", ""):
        if f"{p}embeddings.word_embeddings.weight" in sd:
            prefix = p
            break

    def lin(key):
        return {"kernel": np_(f"{key}.weight").T, "bias": np_(f"{key}.bias")}

    def ln(key):
        return {"scale": np_(f"{key}.weight"), "bias": np_(f"{key}.bias")}

    params: dict[str, Any] = {
        "word_embeddings": {"embedding": np_(f"{prefix}embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": np_(f"{prefix}embeddings.position_embeddings.weight")},
        "embeddings_layer_norm": ln(f"{prefix}embeddings.LayerNorm"),
    }
    if cfg.model_type in ("bert", "roberta"):
        params["token_type_embeddings"] = {
            "embedding": np_(f"{prefix}embeddings.token_type_embeddings.weight")
        }
    if cfg.model_type == "mpnet":
        params["relative_attention_bias"] = {
            "embedding": np_(f"{prefix}encoder.relative_attention_bias.weight")
        }

    for i in range(cfg.num_hidden_layers):
        base = f"{prefix}encoder.layer.{i}"
        if cfg.model_type == "mpnet":
            attn = {
                "query": lin(f"{base}.attention.attn.q"),
                "key": lin(f"{base}.attention.attn.k"),
                "value": lin(f"{base}.attention.attn.v"),
                "dense": lin(f"{base}.attention.attn.o"),
            }
            attn_ln = ln(f"{base}.attention.LayerNorm")
        else:
            attn = {
                "query": lin(f"{base}.attention.self.query"),
                "key": lin(f"{base}.attention.self.key"),
                "value": lin(f"{base}.attention.self.value"),
                "dense": lin(f"{base}.attention.output.dense"),
            }
            attn_ln = ln(f"{base}.attention.output.LayerNorm")
        params[f"layers_{i}"] = {
            "attention": attn,
            "attention_layer_norm": attn_ln,
            "intermediate": lin(f"{base}.intermediate.dense"),
            "output": lin(f"{base}.output.dense"),
            "output_layer_norm": ln(f"{base}.output.LayerNorm"),
        }

    if cfg.num_labels > 0:  # cross-encoder: body nests under "encoder"
        return {
            "encoder": params,
            "classifier_dense": lin("classifier.dense"),
            "classifier_out_proj": lin("classifier.out_proj"),
        }
    return params


# ---------------------------------------------------------------------------
# High-level sentence encoder (tokenizer + batching + pooling)
# ---------------------------------------------------------------------------


class SentenceEncoder:
    """Local-checkpoint sentence encoder: the torch-free replacement for
    sentence-transformers' bi-encoder and cross-encoder and BERTScore's
    embedding model. ``path`` is an HF ``save_pretrained`` dir (safetensors)."""

    def __init__(self, path: str, *, cross_encoder: bool = False, dtype=jnp.float32):
        from ..models.auto import load_tokenizer

        # sentence-transformers layouts keep config.json at the root; plain HF too
        with open(os.path.join(path, "config.json")) as f:
            hf = json.load(f)
        num_labels = 0
        if cross_encoder:
            num_labels = len(hf.get("id2label", {})) or 1
        self.config = encoder_config_from_hf(hf, num_labels=num_labels)
        self.module = (
            CrossEncoderModel(self.config) if cross_encoder else TextEncoder(self.config)
        )
        self.tokenizer = load_tokenizer(path)

        import glob

        from safetensors import safe_open

        tensors: dict[str, np.ndarray] = {}
        for fpath in sorted(glob.glob(os.path.join(path, "*.safetensors"))):
            with safe_open(fpath, framework="np") as sf:
                for k in sf.keys():
                    tensors[k] = sf.get_tensor(k)
        if not tensors:
            raise FileNotFoundError(f"no *.safetensors under {path}")
        params = convert_encoder(tensors, self.config)
        if dtype is not None:
            params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
        self.variables = {"params": params}
        # both modes: one jitted apply (hidden states or classification scores)
        self._apply_fn = jax.jit(
            lambda ids, mask: self.module.apply(self.variables, ids, mask)
        )

    def _tokenize(self, texts: Sequence[str], pair: Optional[Sequence[str]] = None):
        enc = self.tokenizer(
            list(texts),
            text_pair=list(pair) if pair is not None else None,
            padding=True,
            truncation=True,
            max_length=min(self.config.max_position_embeddings - 2, 384),
            return_tensors="np",
        )
        return enc["input_ids"], enc["attention_mask"]

    def hidden_states(self, texts: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
        """(num_layers+1, B, S, D) hidden states + (B, S) mask."""
        ids, mask = self._tokenize(texts)
        return np.asarray(self._apply_fn(jnp.asarray(ids), jnp.asarray(mask))), mask

    def encode(self, texts: Sequence[str], batch_size: int = 32) -> np.ndarray:
        """Mean-pooled L2-normalized sentence embeddings (the all-mpnet-base-v2
        pipeline: Transformer -> mean Pooling -> Normalize)."""
        out = []
        for i in range(0, len(texts), batch_size):
            hiddens, mask = self.hidden_states(texts[i : i + batch_size])
            last = hiddens[-1]
            m = mask[:, :, None].astype(np.float32)
            emb = (last * m).sum(1) / np.maximum(m.sum(1), 1e-9)
            emb = emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            out.append(emb)
        return np.concatenate(out, axis=0)

    def predict_pairs(self, pairs: Sequence[tuple[str, str]], batch_size: int = 32) -> np.ndarray:
        """Cross-encoder scores for (a, b) pairs (sigmoid for 1 label)."""
        out = []
        for i in range(0, len(pairs), batch_size):
            chunk = pairs[i : i + batch_size]
            ids, mask = self._tokenize([a for a, _ in chunk], [b for _, b in chunk])
            out.append(np.asarray(self._apply_fn(jnp.asarray(ids), jnp.asarray(mask))))
        return np.concatenate(out, axis=0)


# ---------------------------------------------------------------------------
# native BERTScore (greedy matching; torchmetrics/bert_score semantics)
# ---------------------------------------------------------------------------

# Known best layers (bert_score's model2layer table, the torchmetrics default)
_BERTSCORE_LAYER = {"roberta-large": 17, "bert-base-uncased": 9, "roberta-base": 10}


def bertscore_native(
    predictions: Sequence[str],
    references: Sequence[str],
    encoder: SentenceEncoder,
    *,
    num_layers: Optional[int] = None,
    baseline: Optional[float] = None,
    batch_size: int = 32,
) -> np.ndarray:
    """Per-pair BERTScore F1 via greedy cosine matching of layer-``num_layers``
    token embeddings (special tokens zero-weighted, like bert_score with
    idf=False). ``baseline`` applies bert_score's rescale_with_baseline:
    (f1 - b) / (1 - b); pass the model's published baseline value."""
    f1s = []
    for i in range(0, len(predictions), batch_size):
        p_chunk = list(predictions[i : i + batch_size])
        r_chunk = list(references[i : i + batch_size])
        ph, pm = encoder.hidden_states(p_chunk)
        rh, rm = encoder.hidden_states(r_chunk)
        layer = num_layers if num_layers is not None else ph.shape[0] - 1
        pe, re_ = ph[layer], rh[layer]
        pe = pe / np.maximum(np.linalg.norm(pe, axis=-1, keepdims=True), 1e-12)
        re_ = re_ / np.maximum(np.linalg.norm(re_, axis=-1, keepdims=True), 1e-12)
        # zero weight for special tokens ([CLS]/[SEP]/<s>/</s>) and padding
        pw = _content_weights(encoder, p_chunk, pm)
        rw = _content_weights(encoder, r_chunk, rm)
        sim = np.einsum("bsd,bld->bsl", pe, re_)
        sim = np.where(pm[:, :, None].astype(bool) & rm[:, None, :].astype(bool), sim, -1e9)
        precision = (sim.max(axis=2) * pw).sum(1) / np.maximum(pw.sum(1), 1e-9)
        recall = (sim.max(axis=1) * rw).sum(1) / np.maximum(rw.sum(1), 1e-9)
        f1 = 2 * precision * recall / np.maximum(precision + recall, 1e-9)
        f1s.append(f1)
    out = np.concatenate(f1s, axis=0)
    if baseline is not None:
        out = (out - baseline) / (1.0 - baseline)
    return out


def _content_weights(encoder: SentenceEncoder, texts: Sequence[str], mask: np.ndarray) -> np.ndarray:
    ids, _ = encoder._tokenize(texts)
    special = np.zeros_like(ids, bool)
    for tid in encoder.tokenizer.all_special_ids:
        special |= ids == tid
    return (mask.astype(bool) & ~special).astype(np.float32)
