"""Device mesh + sharding rules.

The reference's only training parallelism is 8-GPU DDP over NCCL
(/root/reference/README.md:137-155, slurm-scripts/train/submit_train_v2.py:88-93)
plus optional ZeRO-2 optimizer sharding. The TPU-native equivalent is SPMD under
one ``jax.jit``: a ("data", "model") mesh where

  - the batch (and the per-sample video stack) shards over "data" - gradient
    all-reduce rides ICI automatically via XLA;
  - large LM/vision weight matrices optionally shard over "model"
    (tensor-parallel - an additive TPU capability, SURVEY.md 2d);
  - optimizer state shards over "data" like ZeRO (see training.train_state).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None, model: int = 1, *, devices=None
) -> Mesh:
    """Build a ("data", "model") mesh. Defaults: all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    need = data * model
    assert need <= n, f"mesh {data}x{model} needs {need} devices, only {n} available"
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batch pytrees."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree with the leading axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


# ---------------------------------------------------------------------------
# parameter sharding rules (tensor parallel over "model")
# ---------------------------------------------------------------------------


def _param_spec(path: tuple[str, ...], shape: tuple[int, ...]) -> P:
    """Tensor-parallel layout for VideoBLIP / LLaMA params.

    Column-parallel (output dim on "model"): q/k/v projections, fc1/wi,
    LLaMA gate/up. Row-parallel (input dim on "model"): out_proj/o_proj/
    projection, fc2/wo, LLaMA down. Embeddings shard vocab on "model".
    Everything else replicated.

    The PACKED ``qkv_proj`` kernels (OPT [q|k|v], LLaMA GQA [q|k|v]) are
    column-sharded too: the later per-third slice crosses shard boundaries,
    which GSPMD resolves with one small all-gather of the qkv ACTIVATION
    (docs/DESIGN.md "Packed-QKV under tensor parallelism" for the measured
    HLO). The weight matrix itself — the thing TP exists to shard — stays
    evenly split.
    """
    name = path[-2] if len(path) >= 2 else path[-1]
    if len(shape) == 2:
        col = {"q_proj", "k_proj", "v_proj", "qkv_proj", "fc1", "qkv", "query",
               "key", "value", "intermediate", "wi", "wi_0", "wi_1", "q", "k", "v",
               "gate_proj", "up_proj", "lm_head"}
        row = {"out_proj", "fc2", "o", "projection", "output", "wo", "dense",
               "o_proj", "down_proj"}
        if name in col:
            return P(None, MODEL_AXIS)
        if name in row:
            return P(MODEL_AXIS, None)
        if path[-1] == "embedding" and shape[0] > 1024:
            return P(MODEL_AXIS, None)  # vocab-sharded embedding
    return P()


def param_shardings(params: Any, mesh: Mesh, *, tensor_parallel: bool = False) -> Any:
    """NamedSharding pytree for the params. With tensor_parallel=False everything
    is replicated (pure DP, the reference-parity mode)."""

    def leaf(path, x):
        if not tensor_parallel:
            return NamedSharding(mesh, P())
        keys = tuple(
            k.key if hasattr(k, "key") else str(k) for k in path
        )
        return NamedSharding(mesh, _param_spec(keys, x.shape))

    return jax.tree_util.tree_map_with_path(leaf, params)


def shard_variables_for_inference(
    variables: Any, mesh: Mesh, *, tensor_parallel: bool = True
) -> Any:
    """Place loaded model variables on the mesh for tensor-parallel inference.

    Weights land pre-split over the "model" axis per :func:`_param_spec`
    (column q/k/v/fc1, row out/fc2, vocab-sharded embeddings); every jit in
    the generation/classify path then inherits the layout through GSPMD
    propagation — the KV cache picks up head-sharding from the qkv
    projection's output with no decode-loop changes. One chip holds 1/TP of
    the weights, so e.g. the 16 GB-HBM batch-8 bf16 serving point that
    single-chip bf16 cannot hold (docs/PERF.md "batch 8 collapses") fits at
    TP=2. The reference has no inference model sharding at all (accelerate
    ``hf_device_map`` pipeline placement only, /root/reference/eilev/model/v2.py:276-278).

    Token-identical to replicated execution (tests/parallel/test_tp_generate.py).
    """
    sh = param_shardings(variables, mesh, tensor_parallel=tensor_parallel)
    return jax.device_put(variables, sh)
