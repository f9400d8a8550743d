"""GPipe-style pipeline parallelism for the decoder trunk over a "stage" axis.

Why: tensor parallelism (parallel/mesh.py) splits every matmul across chips
and pays an all-reduce per layer; for LMs whose layers fit on one chip but
whose *stack* does not (flan-t5-xl trained in bf16+opt-state, or larger
OPT/LLaMA family members), pipelining the layer stack moves activations —
(microbatch, T, D), a few MB — instead of weights, and its ICI traffic is a
single neighbor ``ppermute`` per stage boundary.

Scheme (classic GPipe over an SPMD mesh, cf. the public scaling-book recipe):
  - the per-layer param trees stack to leaves of shape (L, ...), reshaped to
    (num_stages, L/num_stages, ...) and sharded ``P("stage")`` — each device
    holds a contiguous block of layers;
  - inside one ``shard_map``, the batch splits into M microbatches; at tick t
    stage s runs microbatch t-s (a scan over its layer block), then hands its
    activation to stage s+1 via ``ppermute``. M + S - 1 ticks drain the
    pipe; the bubble fraction is (S-1)/(M+S-1);
  - gradients flow through the same program transposed (the transpose of
    ``ppermute`` is the reverse ``ppermute``), so ``jax.grad`` of a pipelined
    loss needs nothing special.

The reference has no pipeline equivalent (its largest recipe is 8-GPU DDP +
ZeRO-2, /root/reference/slurm-scripts/train/submit_train_v2.py); this is an
additive scale-out capability (SURVEY.md section 2d).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STAGE_AXIS = "stage"
DATA_AXIS_PP = "data"


def make_pipeline_mesh(stages: int, *, data: int = 1, devices=None) -> Mesh:
    """A ("data", "stage") mesh (data=1 collapses to pipeline-only).

    DP x PP composition: the batch shards over "data" while the layer stack
    pipelines over "stage" — each data-parallel replica runs its own GPipe
    schedule, and gradient all-reduces ride "data" as usual.
    """
    devices = devices if devices is not None else jax.devices()
    need = data * stages
    assert need <= len(devices), (data, stages, len(devices))
    arr = np.asarray(devices[:need]).reshape(data, stages)
    return Mesh(arr, (DATA_AXIS_PP, STAGE_AXIS))


def stack_layer_params(
    lm_params: dict, num_layers: int, num_stages: int, *, drop_key: str | None = None
) -> Any:
    """``layers_0..layers_{L-1}`` subtrees -> one tree with leaves
    (num_stages, L/num_stages, ...), ready to shard ``P("stage")``.

    ``drop_key``: param name to strip before stacking — T5's layer 0 carries
    the shared ``relative_attention_bias`` embedding the other layers lack, so
    the trees are only stack-homogeneous without it (the bias is computed
    outside the trunk and broadcast in as a constant extra).
    """
    assert num_layers % num_stages == 0, (num_layers, num_stages)
    from flax.traverse_util import flatten_dict, unflatten_dict

    layers = []
    for i in range(num_layers):
        sub = lm_params[f"layers_{i}"]
        if drop_key is not None:
            flat = {
                k: v for k, v in flatten_dict(sub).items() if drop_key not in k
            }
            sub = unflatten_dict(flat)
        layers.append(sub)
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *layers)
    return jax.tree.map(
        lambda a: a.reshape(num_stages, num_layers // num_stages, *a.shape[1:]), stacked
    )


def unstack_layer_params(stacked: Any, num_layers: int) -> dict:
    """Inverse of :func:`stack_layer_params` (minus any dropped key): back to
    ``{"layers_i": subtree}`` with per-layer leaves, for checkpoint export and
    ``Trainer.current_params``."""
    flat_all = jax.tree.map(
        lambda a: a.reshape(num_layers, *a.shape[2:]), stacked
    )
    return {
        f"layers_{i}": jax.tree.map(lambda a: a[i], flat_all)
        for i in range(num_layers)
    }


def shard_stacked(stacked: Any, mesh: Mesh) -> Any:
    """Place each stage's layer block on its device."""
    sh = NamedSharding(mesh, P(STAGE_AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sh), stacked)


def make_pipeline_trunk(
    layer_apply: Callable[..., jax.Array],
    mesh: Mesh,
    *,
    num_microbatches: int,
    batch_extras: int = 0,
    const_extras: int = 0,
) -> Callable[..., jax.Array]:
    """Build ``fn(stacked_params, x, mask, *extras) -> y`` running the layer
    stack as a pipeline over ``mesh``'s "stage" axis.

    ``layer_apply(layer_params, x, mask, *extras)`` applies ONE layer (params =
    one element of the stacked tree); x: (B, T, D); mask: (B, T). B must divide
    into ``num_microbatches``. The first ``batch_extras`` extra arguments have a
    leading batch axis and are micro-sliced alongside x (e.g. a T5 decoder's
    encoder_hidden / encoder mask); the remaining ``const_extras`` are passed
    through whole (e.g. a shared relative-position bias). Inputs are replicated
    across stages (each stage picks the microbatch it is due to process); the
    output is replicated via a masked psum from the last stage.
    """
    S = mesh.shape[STAGE_AXIS]
    M = num_microbatches

    def per_device(stacked, x, mask, *extras):
        # local leaves are (1, L/S, ...): drop the unit stage axis
        block = jax.tree.map(lambda a: a[0], stacked)
        stage = jax.lax.axis_index(STAGE_AXIS)
        b = x.shape[0]
        mb = b // M
        xs = x.reshape(M, mb, *x.shape[1:])
        masks = mask.reshape(M, mb, mask.shape[1])
        bex = [e.reshape(M, mb, *e.shape[1:]) for e in extras[:batch_extras]]
        cex = list(extras[batch_extras:])

        def run_block(h, m, *es):
            def body(h, lp):
                return layer_apply(lp, h, m, *es, *cex), None

            h, _ = jax.lax.scan(body, h, block)
            return h

        def tick(t, st):
            out, carry = st
            # stage s processes microbatch t - s; clip keeps indices legal
            # during fill/drain (those results are never collected)
            midx = jnp.clip(t - stage, 0, M - 1)
            inject = jax.lax.dynamic_index_in_dim(xs, jnp.clip(t, 0, M - 1), 0, False)
            xcur = jnp.where(stage == 0, inject, carry)
            m = jax.lax.dynamic_index_in_dim(masks, midx, 0, False)
            es = [jax.lax.dynamic_index_in_dim(e, midx, 0, False) for e in bex]
            y = run_block(xcur, m, *es)
            oidx = t - (S - 1)
            valid = jnp.logical_and(stage == S - 1, jnp.logical_and(oidx >= 0, oidx < M))
            upd = jax.lax.dynamic_update_index_in_dim(
                out, y.astype(out.dtype), jnp.clip(oidx, 0, M - 1), 0
            )
            out = jnp.where(valid, upd, out)
            carry = jax.lax.ppermute(
                y, STAGE_AXIS, [(i, i + 1) for i in range(S - 1)]
            )
            return out, carry

        out0 = jnp.zeros_like(xs)
        carry0 = jnp.zeros_like(xs[0])
        out, _ = jax.lax.fori_loop(0, M + S - 1, tick, (out0, carry0))
        # only the last stage holds real outputs; replicate with a masked psum
        out = jax.lax.psum(
            jnp.where(stage == S - 1, out, jnp.zeros_like(out)), STAGE_AXIS
        )
        return out.reshape(b, *x.shape[1:])

    try:
        from jax import shard_map

        kwargs = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

        kwargs = {"check_rep": False}

    # batch (and output) shard over "data" when the mesh carries a data axis;
    # each data replica runs its own independent GPipe schedule over "stage"
    batch_spec = P(DATA_AXIS_PP) if DATA_AXIS_PP in mesh.shape else P()
    in_specs = (
        (P(STAGE_AXIS), batch_spec, batch_spec)
        + (batch_spec,) * batch_extras
        + (P(),) * const_extras
    )
    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=batch_spec,
        **kwargs,
    )


def opt_layer_apply(config, dtype=jnp.float32) -> Callable:
    """``layer_apply`` for :class:`models.opt.OPTDecoderLayer` param subtrees
    (causal + padding-mask attention, training forward, no cache)."""
    from ..models.opt import OPTDecoderLayer

    layer = OPTDecoderLayer(config, dtype=dtype)

    def apply(lp, x, mask):
        y, _ = layer.apply(
            {"params": lp}, x, {"causal": True, "padding_mask": mask}
        )
        return y

    return apply


def t5_encoder_layer_apply(config, dtype=jnp.float32) -> Callable:
    """``layer_apply`` for :class:`models.t5.T5EncoderLayer` param subtrees.

    Signature: ``apply(lp, x, mask, rel_bias)`` — ``rel_bias`` is the (H, S, S)
    relative-position bias computed once from layer 0's shared embedding
    (stripped from the stacked tree by ``stack_layer_params(drop_key=
    "relative_attention_bias")``) and broadcast to every stage as a const
    extra (``const_extras=1``)."""
    from ..models.t5 import T5EncoderLayer

    layer = T5EncoderLayer(config, has_relative_attention_bias=False, dtype=dtype)

    def apply(lp, x, mask, rel_bias):
        return layer.apply(
            {"params": lp}, x, {"bias": rel_bias, "padding_mask": mask}
        )

    return apply


def t5_decoder_layer_apply(config, dtype=jnp.float32) -> Callable:
    """``layer_apply`` for :class:`models.t5.T5DecoderLayer` param subtrees.

    Signature: ``apply(lp, x, dec_mask, encoder_hidden, enc_mask, rel_bias)``
    — encoder_hidden/enc_mask are per-batch (``batch_extras=2``), the causal
    relative-position bias is a const extra (``const_extras=1``). Each stage
    projects its own cross-attention K/V from encoder_hidden (the projections
    live in the stage's stacked layer params)."""
    from ..models.t5 import T5DecoderLayer

    layer = T5DecoderLayer(config, has_relative_attention_bias=False, dtype=dtype)

    def apply(lp, x, dec_mask, encoder_hidden, enc_mask, rel_bias):
        def run(mdl, x):
            ck, cv = mdl.cross_attention.kv(encoder_hidden)
            y, _ = mdl(
                x,
                {"bias": rel_bias, "causal": True, "padding_mask": dec_mask},
                ck,
                cv,
                enc_mask,
            )
            return y

        return layer.apply({"params": lp}, x, method=run)

    return apply
