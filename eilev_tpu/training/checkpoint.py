"""Checkpointing: orbax-native save/restore + HF safetensors interchange.

The reference delegates checkpointing to HF Trainer ``save_pretrained``
directories (/root/reference/scripts/general/train_v2.py:205-219, README.md:161-163)
and loads published Hub checkpoints (kpyu/eilev-blip2-opt-2.7b etc.).

Here:
  - native training checkpoints are orbax (async-capable, sharding-aware):
    {step, trainable, opt_state} - the frozen towers never change, so only the
    trainable subtree is checkpointed (Q-Former + projection + query tokens,
    ~188 MB fp32 instead of 15 GB);
  - interchange with the HF ecosystem goes through safetensors:
    ``models.convert.load_hf_checkpoint`` imports, :func:`export_hf_safetensors`
    exports the exact inverse mapping, so users can hand checkpoints back to the
    torch reference.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from ..configs import OPTConfig, T5Config, VideoBlipConfig
from .train_state import TrainState


def _payload(state: TrainState, best: Optional[tuple]) -> dict:
    payload = {
        "step": np.asarray(int(state.step), np.int32),
        "trainable": state.trainable,
        "opt_state": state.opt_state,
    }
    if best is not None:
        best_loss, best_trainable = best
        payload["best_loss"] = np.asarray(best_loss, np.float32)
        payload["best_trainable"] = best_trainable
    return payload


def save_checkpoint(
    ckpt_dir: str, state: TrainState, *, keep: int = 3, best: Optional[tuple] = None
) -> str:
    """Save {step, trainable, opt_state} under ckpt_dir/<step>; prune to ``keep``
    newest (reference recipe: save_total_limit 3).

    ``best`` = (best_eval_loss, best_trainable) persists the
    load_best_model_at_end snapshot so it survives preemption (HF Trainer keeps
    the equivalent in its checkpoint dirs, reference train_v2.py:205)."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), str(int(state.step)))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _payload(state, best), force=True)
    ckptr.wait_until_finished()
    _prune(ckpt_dir, keep)
    return path


class AsyncCheckpointWriter:
    """Checkpoint saves that overlap training compute.

    orbax's StandardCheckpointer is an AsyncCheckpointer: ``save`` returns
    after staging the arrays host-side and writes in a background thread.
    The blocking ``save_checkpoint`` above waits immediately; this wrapper
    defers the wait until the *next* save (or an explicit ``wait()``), so the
    save_steps cadence costs device-to-host staging only. Safe because the
    train step does not donate the trainable/opt-state buffers being written
    (trainer.py builds the step with donation off). The reference's HF Trainer
    has no async equivalent — its ``save_pretrained`` blocks the step loop.
    """

    def __init__(self) -> None:
        import orbax.checkpoint as ocp

        self._ckptr = ocp.StandardCheckpointer()
        self._pending: Optional[tuple[str, int]] = None  # (ckpt_dir, keep)

    def save(
        self, ckpt_dir: str, state: TrainState, *, keep: int = 3,
        best: Optional[tuple] = None,
    ) -> str:
        self.wait()  # one save in flight at a time (orbax requirement)
        path = os.path.join(os.path.abspath(ckpt_dir), str(int(state.step)))
        self._ckptr.save(path, _payload(state, best), force=True)
        self._pending = (ckpt_dir, keep)
        return path

    def wait(self) -> None:
        """Block until the in-flight save (if any) commits, then prune."""
        if self._pending is None:
            return
        ckpt_dir, keep = self._pending
        self._pending = None
        self._ckptr.wait_until_finished()
        _prune(ckpt_dir, keep)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    if not steps:
        return None
    return os.path.join(os.path.abspath(ckpt_dir), str(max(steps)))


def restore_checkpoint(path: str, state: TrainState, *, with_best: bool = False):
    """Restore into the (shape/sharding) structure of ``state``.

    With ``with_best`` returns ``(state, best)`` where best is
    (best_eval_loss, best_trainable) if the checkpoint carries one, else None
    (older checkpoints predate the field)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {
        "step": np.asarray(0, np.int32),
        "trainable": state.trainable,
        "opt_state": state.opt_state,
    }
    has_best = os.path.isdir(os.path.join(path, "best_trainable")) or os.path.exists(
        os.path.join(path, "_METADATA")
    ) and _metadata_has_best(path)
    if with_best and has_best:
        target["best_loss"] = np.asarray(0.0, np.float32)
        target["best_trainable"] = jax.tree.map(lambda x: x, state.trainable)
    restored = ckptr.restore(path, target)
    new_state = state.replace(
        step=jax.numpy.asarray(restored["step"]),
        trainable=restored["trainable"],
        opt_state=restored["opt_state"],
    )
    if not with_best:
        return new_state
    best = None
    if "best_trainable" in restored:
        best = (float(restored["best_loss"]), restored["best_trainable"])
    return new_state, best


def _metadata_has_best(path: str) -> bool:
    try:
        with open(os.path.join(path, "_METADATA")) as f:
            return '"best_trainable"' in f.read()
    except OSError:
        return False


def _prune(ckpt_dir: str, keep: int) -> None:
    import shutil

    steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    for s in steps[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, str(s)), ignore_errors=True)


# ---------------------------------------------------------------------------
# HF safetensors export (inverse of models.convert)
# ---------------------------------------------------------------------------


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


def _put_linear(out: dict, key: str, p: dict) -> None:
    out[f"{key}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        out[f"{key}.bias"] = _np(p["bias"])


def _put_ln(out: dict, key: str, p: dict) -> None:
    out[f"{key}.weight"] = _np(p["scale"])
    out[f"{key}.bias"] = _np(p["bias"])


def _put_rms(out: dict, key: str, p: dict) -> None:
    out[f"{key}.weight"] = _np(p["scale"])


def hf_state_dict(params: dict, config: VideoBlipConfig) -> dict[str, np.ndarray]:
    """Flax params -> HF ``VideoBlipForConditionalGeneration`` tensor names."""
    out: dict[str, np.ndarray] = {}
    qd = config.qformer_config.hidden_size
    out["query_tokens"] = _np(params["query_tokens"]).reshape(1, config.num_query_tokens, qd)

    # vision
    vis = params["vision_model"]["vision"]
    emb = vis["embeddings"]
    d = emb["patch_bias"].shape[0]
    p = config.vision_config.patch_size
    out["vision_model.embeddings.patch_embedding.weight"] = (
        _np(emb["patch_kernel"]).reshape(3, p, p, d).transpose(3, 0, 1, 2)
    )
    out["vision_model.embeddings.patch_embedding.bias"] = _np(emb["patch_bias"])
    out["vision_model.embeddings.class_embedding"] = _np(emb["class_embedding"]).reshape(1, 1, d)
    out["vision_model.embeddings.position_embedding"] = _np(emb["position_embedding"])[None]
    _put_ln(out, "vision_model.post_layernorm", vis["post_layernorm"])
    for i in range(config.vision_config.num_hidden_layers):
        layer = vis[f"layers_{i}"]
        base = f"vision_model.encoder.layers.{i}"
        _put_ln(out, f"{base}.layer_norm1", layer["layer_norm1"])
        _put_ln(out, f"{base}.layer_norm2", layer["layer_norm2"])
        _put_linear(out, f"{base}.self_attn.qkv", layer["self_attn"]["qkv"])
        _put_linear(out, f"{base}.self_attn.projection", layer["self_attn"]["projection"])
        _put_linear(out, f"{base}.mlp.fc1", layer["mlp"]["fc1"])
        _put_linear(out, f"{base}.mlp.fc2", layer["mlp"]["fc2"])

    # qformer
    qf = params["qformer"]
    _put_ln(out, "qformer.layernorm", qf["layernorm"])
    for i in range(config.qformer_config.num_hidden_layers):
        layer = qf[f"layers_{i}"]
        base = f"qformer.encoder.layer.{i}"
        for blk, hf_blk in [("attention", "attention")] + (
            [("crossattention", "crossattention")] if "crossattention" in layer else []
        ):
            _put_linear(out, f"{base}.{hf_blk}.attention.query", layer[blk]["attention"]["query"])
            _put_linear(out, f"{base}.{hf_blk}.attention.key", layer[blk]["attention"]["key"])
            _put_linear(out, f"{base}.{hf_blk}.attention.value", layer[blk]["attention"]["value"])
            _put_linear(out, f"{base}.{hf_blk}.output.dense", layer[blk]["output"]["dense"])
            _put_ln(out, f"{base}.{hf_blk}.output.LayerNorm", layer[blk]["output"]["layer_norm"])
        _put_linear(out, f"{base}.intermediate_query.dense", layer["ffn_query"]["intermediate"])
        _put_linear(out, f"{base}.output_query.dense", layer["ffn_query"]["output"])
        _put_ln(out, f"{base}.output_query.LayerNorm", layer["ffn_query"]["layer_norm"])

    _put_linear(out, "language_projection", params["language_projection"])

    lm = params["language_model"]
    if isinstance(config.text_config, OPTConfig):
        tcfg = config.text_config
        base = "language_model.model.decoder"
        out[f"{base}.embed_tokens.weight"] = _np(lm["embed_tokens"]["embedding"])
        out["language_model.lm_head.weight"] = out[f"{base}.embed_tokens.weight"]
        out[f"{base}.embed_positions.weight"] = _np(lm["embed_positions"]["embedding"])
        if tcfg.word_embed_proj_dim != tcfg.hidden_size:
            _put_linear(out, f"{base}.project_in", lm["project_in"])
            _put_linear(out, f"{base}.project_out", lm["project_out"])
        if tcfg.do_layer_norm_before:
            _put_ln(out, f"{base}.final_layer_norm", lm["final_norm"])
        for i in range(tcfg.num_hidden_layers):
            layer = lm[f"layers_{i}"]
            lb = f"{base}.layers.{i}"
            # the packed qkv kernel splits back into HF's three projections
            d = tcfg.hidden_size
            qkv = layer["self_attn"]["qkv_proj"]
            for j, proj in enumerate(("q_proj", "k_proj", "v_proj")):
                _put_linear(
                    out,
                    f"{lb}.self_attn.{proj}",
                    {
                        "kernel": _np(qkv["kernel"])[:, j * d : (j + 1) * d],
                        "bias": _np(qkv["bias"])[j * d : (j + 1) * d],
                    },
                )
            _put_linear(out, f"{lb}.self_attn.out_proj", layer["self_attn"]["out_proj"])
            _put_ln(out, f"{lb}.self_attn_layer_norm", layer["self_attn_layer_norm"])
            _put_ln(out, f"{lb}.final_layer_norm", layer["final_layer_norm"])
            _put_linear(out, f"{lb}.fc1", layer["fc1"])
            _put_linear(out, f"{lb}.fc2", layer["fc2"])
    else:
        tcfg5: T5Config = config.text_config
        base = "language_model"
        out[f"{base}.shared.weight"] = _np(lm["shared"]["embedding"])
        out[f"{base}.encoder.embed_tokens.weight"] = out[f"{base}.shared.weight"]
        out[f"{base}.decoder.embed_tokens.weight"] = out[f"{base}.shared.weight"]
        if not tcfg5.tie_word_embeddings:
            _put_linear(out, f"{base}.lm_head", lm["lm_head"])
        _put_rms(out, f"{base}.encoder.final_layer_norm", lm["encoder"]["final_layer_norm"])
        _put_rms(out, f"{base}.decoder.final_layer_norm", lm["decoder"]["final_layer_norm"])

        def put_attn(prefix: str, p: dict) -> None:
            for name in ("q", "k", "v", "o"):
                _put_linear(out, f"{prefix}.{name}", p[name])
            if "relative_attention_bias" in p:
                out[f"{prefix}.relative_attention_bias.weight"] = _np(
                    p["relative_attention_bias"]["embedding"]
                )

        def put_ff(prefix: str, p: dict) -> None:
            if tcfg5.is_gated_act:
                _put_linear(out, f"{prefix}.DenseReluDense.wi_0", p["wi_0"])
                _put_linear(out, f"{prefix}.DenseReluDense.wi_1", p["wi_1"])
            else:
                _put_linear(out, f"{prefix}.DenseReluDense.wi", p["wi"])
            _put_linear(out, f"{prefix}.DenseReluDense.wo", p["wo"])

        for i in range(tcfg5.num_layers):
            blk = lm["encoder"][f"layers_{i}"]
            eb = f"{base}.encoder.block.{i}"
            put_attn(f"{eb}.layer.0.SelfAttention", blk["self_attention"]["attention"])
            _put_rms(out, f"{eb}.layer.0.layer_norm", blk["self_attention"]["layer_norm"])
            put_ff(f"{eb}.layer.1", blk["ff"])
            _put_rms(out, f"{eb}.layer.1.layer_norm", blk["ff"]["layer_norm"])
        for i in range(tcfg5.num_decoder_layers):
            blk = lm["decoder"][f"layers_{i}"]
            db = f"{base}.decoder.block.{i}"
            put_attn(f"{db}.layer.0.SelfAttention", blk["self_attention"]["attention"])
            _put_rms(out, f"{db}.layer.0.layer_norm", blk["self_attention"]["layer_norm"])
            put_attn(f"{db}.layer.1.EncDecAttention", blk["cross_attention"]["attention"])
            _put_rms(out, f"{db}.layer.1.layer_norm", blk["cross_attention"]["layer_norm"])
            put_ff(f"{db}.layer.2", blk["ff"])
            _put_rms(out, f"{db}.layer.2.layer_norm", blk["ff"]["layer_norm"])
    return out


def export_hf_safetensors(params: dict, config: VideoBlipConfig, path: str) -> str:
    """Write a ``model.safetensors`` loadable by the torch reference."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    sd = hf_state_dict(params, config)
    # contiguous fp32
    sd = {k: np.ascontiguousarray(v.astype(np.float32)) for k, v in sd.items()}
    f = os.path.join(path, "model.safetensors")
    save_file(sd, f)
    return f
