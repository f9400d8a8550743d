"""Pipeline-parallel train/eval steps: the product path for GPipe over "stage".

Scope: the LM trunk (the frozen decoder stack — OPT layers, or T5
encoder+decoder layers) pipelines over the mesh's "stage" axis via
``parallel.pipeline.make_pipeline_trunk``; everything around it (vision tower,
Q-Former, projection, embeddings, final norms, lm head) runs replicated per
data shard exactly like the plain DP path. Gradients for the trainable subtree
(Q-Former/projection/query tokens — reference freeze list,
/root/reference/scripts/general/train_v2.py:124-130) flow through the
transposed pipeline automatically.

One deliberate difference from the DP path: the PP trunk runs the FROZEN LM
layers deterministically (no LM-internal dropout). The reference activates
dropout everywhere under HF ``Trainer.train()``, but on frozen weights it is a
regularization detail, and keeping the trunk rng-free keeps the GPipe schedule
a pure scan. Q-Former dropout (the trainable part) stays active.

Reference scale context: the reference's only parallelism is 8-GPU DDP
(+ZeRO-2); pipeline parallelism is an additive TPU capability (SURVEY.md 2d).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax.traverse_util import flatten_dict, unflatten_dict

from ..configs import OPTConfig
from ..models.video_blip import (
    VideoBlipForConditionalGeneration as VB,
    masked_cross_entropy,
    shift_tokens_right,
)
from ..parallel.pipeline import (
    STAGE_AXIS,
    make_pipeline_trunk,
    opt_layer_apply,
    shard_stacked,
    stack_layer_params,
    t5_decoder_layer_apply,
    t5_encoder_layer_apply,
    unstack_layer_params,
)
from .train_state import TrainState, merge_params

_REL_BIAS = "relative_attention_bias"


def pp_partition_frozen(frozen: dict, config, num_stages: int) -> tuple[dict, dict]:
    """Split the frozen tree into (rest, stacked_layer_trees).

    ``rest`` keeps everything outside the LM layer stacks — including, for T5,
    layer 0's shared relative-position bias embedding at its original path (the
    bias is computed outside the trunk). ``stacked`` holds
    ``{"lm": ...}`` (OPT) or ``{"enc": ..., "dec": ...}`` (T5) with leaves
    shaped (num_stages, L/num_stages, ...), ready for ``shard_stacked``.
    """
    lm = frozen["language_model"]
    rest = {k: v for k, v in frozen.items() if k != "language_model"}
    if isinstance(config.text_config, OPTConfig):
        num_layers = config.text_config.num_hidden_layers
        stacked = {"lm": stack_layer_params(lm, num_layers, num_stages)}
        rest["language_model"] = {
            k: v for k, v in lm.items() if not k.startswith("layers_")
        }
    else:
        tcfg = config.text_config
        enc, dec = lm["encoder"], lm["decoder"]
        stacked = {
            "enc": stack_layer_params(
                enc, tcfg.num_layers, num_stages, drop_key=_REL_BIAS
            ),
            "dec": stack_layer_params(
                dec, tcfg.num_decoder_layers, num_stages, drop_key=_REL_BIAS
            ),
        }
        rest_lm: dict = {k: v for k, v in lm.items() if k not in ("encoder", "decoder")}
        for side, tree in (("encoder", enc), ("decoder", dec)):
            keep = {k: v for k, v in tree.items() if not k.startswith("layers_")}
            bias_flat = {
                ("layers_0",) + k: v
                for k, v in flatten_dict(tree["layers_0"]).items()
                if _REL_BIAS in k
            }
            keep.update(unflatten_dict(bias_flat))
            rest_lm[side] = keep
        rest["language_model"] = rest_lm
    return rest, stacked


def pp_unpartition_frozen(rest: dict, stacked: dict, config) -> dict:
    """Inverse of :func:`pp_partition_frozen` — the full frozen tree, for
    ``Trainer.current_params`` / checkpoint export."""
    frozen = dict(rest)
    lm = dict(rest["language_model"])
    if isinstance(config.text_config, OPTConfig):
        lm.update(unstack_layer_params(stacked["lm"], config.text_config.num_hidden_layers))
    else:
        tcfg = config.text_config
        for side, key, n in (
            ("encoder", "enc", tcfg.num_layers),
            ("decoder", "dec", tcfg.num_decoder_layers),
        ):
            side_tree = dict(lm[side])
            layers = unstack_layer_params(stacked[key], n)
            # deep-merge layers_0: the rel-bias subtree stayed in `rest`
            flat = dict(flatten_dict(side_tree))
            flat.update(flatten_dict(layers))
            lm[side] = unflatten_dict(flat)
    frozen["language_model"] = lm
    return frozen


def make_pp_forward(
    model: VB, mesh, *, num_microbatches: int, dropout: bool = True
) -> Callable:
    """``forward(trainable, frozen_rest, stacked, micro, rng) -> (loss, logits)``
    with the LM trunk(s) pipelined over "stage"."""
    cfg = model.config
    is_opt = isinstance(cfg.text_config, OPTConfig)
    if is_opt:
        trunk = make_pipeline_trunk(
            opt_layer_apply(cfg.text_config, model.dtype),
            mesh,
            num_microbatches=num_microbatches,
        )
    else:
        enc_trunk = make_pipeline_trunk(
            t5_encoder_layer_apply(cfg.text_config, model.dtype),
            mesh,
            num_microbatches=num_microbatches,
            const_extras=1,
        )
        dec_trunk = make_pipeline_trunk(
            t5_decoder_layer_apply(cfg.text_config, model.dtype),
            mesh,
            num_microbatches=num_microbatches,
            batch_extras=2,
            const_extras=1,
        )

    def forward(trainable, frozen_rest, stacked, micro, rng):
        params = merge_params(trainable, frozen_rest)
        variables = {"params": params}
        ids = micro["input_ids"]
        mask = micro.get("attention_mask")
        if mask is None:
            mask = jnp.ones_like(ids)
        labels = micro["labels"]
        rngs = {"dropout": rng} if dropout else {}
        embeds = model.apply(
            variables,
            ids,
            micro.get("pixel_values"),
            micro.get("video_input_mask"),
            not dropout,
            method=VB.embed_and_scatter,
            rngs=rngs,
        )
        if is_opt:
            x = model.apply(variables, embeds, mask, method=VB.lm_pre_layers)
            x = trunk(stacked["lm"], x, mask)
            logits = model.apply(variables, x, method=VB.lm_post_layers)
            loss = masked_cross_entropy(logits[:, :-1], labels[:, 1:])
        else:
            tcfg = cfg.text_config
            enc_bias = model.apply(
                variables, embeds.shape[1], method=VB.t5_encoder_rel_bias
            )
            h = enc_trunk(stacked["enc"], embeds, mask, enc_bias)
            enc_h = model.apply(variables, h, method=VB.t5_encoder_post)
            dec_ids = shift_tokens_right(
                labels, tcfg.pad_token_id, tcfg.decoder_start_token_id
            )
            dec_embeds = model.apply(variables, dec_ids, method=VB.lm_embed)
            dec_mask = jnp.ones_like(dec_ids)
            dec_bias = model.apply(
                variables, dec_ids.shape[1], method=VB.t5_decoder_rel_bias
            )
            hd = dec_trunk(stacked["dec"], dec_embeds, dec_mask, enc_h, mask, dec_bias)
            logits = model.apply(variables, hd, method=VB.t5_decoder_post)
            loss = masked_cross_entropy(logits, labels)
        return loss

    return forward


def make_pp_train_step(
    model: VB,
    mesh,
    *,
    num_microbatches: int,
    accum_steps: int = 1,
    dropout: bool = True,
) -> Callable:
    """Pipeline-parallel version of ``train_state.make_train_step``. The frozen
    argument is the (rest, stacked) pair from :func:`pp_partition_frozen`."""
    forward = make_pp_forward(
        model, mesh, num_microbatches=num_microbatches, dropout=dropout
    )
    grad_fn = jax.value_and_grad(forward)

    def train_step(state: TrainState, frozen: tuple[dict, dict], batch: Any):
        frozen_rest, stacked = frozen
        base_rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)

        def micro_step(carry, inp):
            micro, rng = inp
            loss_sum, grad_sum = carry
            loss, grads = grad_fn(state.trainable, frozen_rest, stacked, micro, rng)
            return (loss_sum + loss, jax.tree.map(jnp.add, grad_sum, grads)), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.trainable)
        micro_rngs = jax.random.split(base_rng, accum_steps)
        (loss_sum, grad_sum), _ = jax.lax.scan(
            micro_step, (jnp.zeros((), jnp.float32), zero_grads), (batch, micro_rngs)
        )
        inv = 1.0 / accum_steps
        loss = loss_sum * inv
        grads = jax.tree.map(lambda g: g * inv, grad_sum)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        new_state = state.replace(
            step=state.step + 1, trainable=new_trainable, opt_state=new_opt
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return train_step


def make_pp_eval_step(model: VB, mesh, *, num_microbatches: int) -> Callable:
    """``eval(trainable, frozen_rest, stacked, batch) -> loss`` with the trunk
    pipelined (no replicated full-layer params at eval time)."""
    forward = make_pp_forward(model, mesh, num_microbatches=num_microbatches, dropout=False)

    def eval_step(trainable, frozen_rest, stacked, batch):
        return forward(trainable, frozen_rest, stacked, batch, jax.random.PRNGKey(0))

    return eval_step
