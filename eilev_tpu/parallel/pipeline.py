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


def stack_layer_params(lm_params: dict, num_layers: int, num_stages: int) -> Any:
    """``layers_0..layers_{L-1}`` subtrees -> one tree with leaves
    (num_stages, L/num_stages, ...), ready to shard ``P("stage")``."""
    assert num_layers % num_stages == 0, (num_layers, num_stages)
    layers = [lm_params[f"layers_{i}"] for i in range(num_layers)]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *layers)
    return jax.tree.map(
        lambda a: a.reshape(num_stages, num_layers // num_stages, *a.shape[1:]), stacked
    )


def shard_stacked(stacked: Any, mesh: Mesh) -> Any:
    """Place each stage's layer block on its device."""
    sh = NamedSharding(mesh, P(STAGE_AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sh), stacked)


def make_pipeline_trunk(
    layer_apply: Callable[[dict, jax.Array, jax.Array], jax.Array],
    mesh: Mesh,
    *,
    num_microbatches: int,
) -> Callable[[Any, jax.Array, jax.Array], jax.Array]:
    """Build ``fn(stacked_params, x, mask) -> y`` running the layer stack as a
    pipeline over ``mesh``'s "stage" axis.

    ``layer_apply(layer_params, x, mask)`` applies ONE layer (params = one
    element of the stacked tree); x: (B, T, D); mask: (B, T). B must divide
    into ``num_microbatches``. Inputs are replicated across stages (each
    stage picks the microbatch it is due to process); the output is
    replicated via a masked psum from the last stage.
    """
    S = mesh.shape[STAGE_AXIS]
    M = num_microbatches

    def per_device(stacked, x, mask):
        # local leaves are (1, L/S, ...): drop the unit stage axis
        block = jax.tree.map(lambda a: a[0], stacked)
        stage = jax.lax.axis_index(STAGE_AXIS)
        b = x.shape[0]
        mb = b // M
        xs = x.reshape(M, mb, *x.shape[1:])
        masks = mask.reshape(M, mb, mask.shape[1])

        def run_block(h, m):
            def body(h, lp):
                return layer_apply(lp, h, m), None

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
            y = run_block(xcur, m)
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
    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(STAGE_AXIS), batch_spec, batch_spec),
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
