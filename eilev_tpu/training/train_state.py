"""Train state, frozen-tower partitioning, and the compiled train step.

Reference recipe being reproduced (/root/reference/scripts/general/train_v2.py:104-219):
freeze the vision tower and the LM, train Q-Former + language projection + query
tokens, grad-accumulate to a global batch, AdamW with warmup, fp32 master weights.

TPU-native structure:
  - trainable/frozen split at the pytree level: gradients are only computed for
    the trainable subtree (the reference merely sets requires_grad=False; here the
    backward pass for frozen weights never exists). Gradients still flow *through*
    the frozen LM to the scattered video features (train_v2.py:130's
    enable_input_require_grads is implicit in JAX).
  - gradient accumulation is a ``lax.scan`` over microbatches inside one jit
    (SURVEY.md 2d), so the accumulate loop costs no host round-trips;
  - under a ("data", "model") mesh the same step function runs SPMD: the batch
    shards over "data" and XLA inserts the gradient all-reduce (DDP equivalent);
    optimizer state can shard over "data" (ZeRO-2 equivalent) via
    ``zero_sharded_opt_state``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.traverse_util import flatten_dict, unflatten_dict

TRAINABLE_PREFIXES = ("query_tokens", "qformer", "language_projection")


def partition_params(params: dict) -> tuple[dict, dict]:
    """Split into (trainable, frozen) by top-level module, per the reference
    freeze list (train_v2.py:124-130)."""
    flat = flatten_dict(params)
    trainable = {k: v for k, v in flat.items() if k[0] in TRAINABLE_PREFIXES}
    frozen = {k: v for k, v in flat.items() if k[0] not in TRAINABLE_PREFIXES}
    return unflatten_dict(trainable), unflatten_dict(frozen)


def merge_params(trainable: dict, frozen: dict) -> dict:
    flat = dict(flatten_dict(frozen))
    flat.update(flatten_dict(trainable))
    return unflatten_dict(flat)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    trainable: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, trainable: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            trainable=trainable,
            opt_state=tx.init(trainable),
            tx=tx,
        )


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Mirrors the HF TrainingArguments subset the reference uses
    (slurm-scripts/train/submit_train_v2.py:22-37: lr 1e-4, warmup 1000 steps,
    AdamW, weight_decay 0.05)."""

    learning_rate: float = 1e-4
    warmup_steps: int = 1000
    total_steps: int = 10000
    weight_decay: float = 0.05
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    schedule: str = "linear"  # HF Trainer default: linear decay after warmup
    # > 0: maintain an exponential moving average of the trainable params
    # inside the optimizer state (checkpoint/ZeRO-compatible for free);
    # read it back with ema_params(state). 0 disables (reference has no EMA).
    ema_decay: float = 0.0


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    if cfg.schedule == "linear":
        sched = optax.join_schedules(
            [
                optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
                optax.linear_schedule(
                    cfg.learning_rate, 0.0, max(cfg.total_steps - cfg.warmup_steps, 1)
                ),
            ],
            [cfg.warmup_steps],
        )
    elif cfg.schedule == "constant":
        sched = optax.constant_schedule(cfg.learning_rate)
    else:
        raise ValueError(cfg.schedule)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            sched, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps, weight_decay=cfg.weight_decay
        ),
    )
    if cfg.ema_decay:
        tx = with_param_ema(tx, cfg.ema_decay)
    return tx


class _EmaState(struct.PyTreeNode):
    inner: Any
    ema: Any


def with_param_ema(
    tx: optax.GradientTransformation, decay: float
) -> optax.GradientTransformation:
    """Wrap ``tx`` so the optimizer state also carries an exponential moving
    average of the PARAMETERS (ema <- decay*ema + (1-decay)*new_params each
    step). Living inside opt_state, the EMA checkpoints, restores, and
    ZeRO-shards through the existing machinery with zero extra plumbing;
    fetch it with :func:`ema_params`."""

    def init(params):
        return _EmaState(inner=tx.init(params), ema=jax.tree.map(jnp.asarray, params))

    def update(updates, state, params=None):
        updates, inner = tx.update(updates, state.inner, params)
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.ema, new_params
        )
        return updates, _EmaState(inner=inner, ema=ema)

    return optax.GradientTransformation(init, update)


def ema_params(state: "TrainState") -> Any:
    """The EMA shadow of ``state.trainable`` (requires an optimizer built with
    ``ema_decay > 0``)."""
    assert isinstance(state.opt_state, _EmaState), (
        "optimizer was not built with ema_decay > 0"
    )
    return state.opt_state.ema


def make_train_step(
    model,
    *,
    accum_steps: int = 1,
    loss_key: str = "loss",
    dropout: bool = True,
) -> Callable:
    """Build the jittable train step.

    ``batch`` layout: every array has a leading microbatch axis of size
    ``accum_steps`` (ONE device batch = accum_steps microbatches); pixel_values is
    (accum, videos_per_micro, C, T, H, W). With accum_steps == 1 the scan
    degenerates to a single iteration and XLA elides it.

    With ``dropout`` (default, matching the reference: HF Trainer trains the
    Q-Former with its 0.1 dropouts active) the per-step key is derived from the
    step counter, so training is reproducible and resume-safe.
    """

    def loss_fn(trainable, frozen, micro, dropout_rng):
        params = merge_params(trainable, frozen)
        out = model.apply(
            {"params": params},
            input_ids=micro["input_ids"],
            attention_mask=micro.get("attention_mask"),
            pixel_values=micro.get("pixel_values"),
            video_input_mask=micro.get("video_input_mask"),
            labels=micro["labels"],
            deterministic=not dropout,
            rngs={"dropout": dropout_rng} if dropout else {},
        )
        return out[loss_key]

    grad_fn = jax.value_and_grad(loss_fn)

    def train_step(state: TrainState, frozen: Any, batch: Any):
        base_rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)

        def micro_step(carry, inp):
            micro, rng = inp
            loss_sum, grad_sum = carry
            loss, grads = grad_fn(state.trainable, frozen, micro, rng)
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


def eval_step(model, params: Any, batch: Any) -> jax.Array:
    out = model.apply(
        {"params": params},
        input_ids=batch["input_ids"],
        attention_mask=batch.get("attention_mask"),
        pixel_values=batch.get("pixel_values"),
        video_input_mask=batch.get("video_input_mask"),
        labels=batch["labels"],
    )
    return out["loss"]


def zero_sharded_opt_state(state: TrainState, mesh, axis: str = "data"):
    """ZeRO-2-equivalent sharding spec for the optimizer state: first-axis shard
    every optimizer moment whose first dim divides the axis size (reference's
    optional DeepSpeed ZeRO-2, submit_train_v2.py:38-65)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis_size = mesh.shape[axis]

    def spec(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % axis_size == 0:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, state.opt_state)
