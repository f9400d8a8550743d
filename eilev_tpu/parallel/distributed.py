"""Multi-host (multi-process) SPMD utilities.

The reference's multi-node story is torchrun c10d rendezvous + NCCL DDP
(/root/reference/README.md:137-139). The TPU-native equivalent is
``jax.distributed.initialize`` (one process per host, all chips in one global
mesh); gradients all-reduce over ICI inside the jitted step, and the only
host-side coordination left is data loading - each host feeds its shard of the
global batch (``host_local_batch_to_global``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. On TPU pods with standard env metadata all args
    auto-detect; no-op when already initialized or single-process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


def host_local_batch_to_global(batch: Any, mesh, *, batch_axis: int = 1) -> Any:
    """Assemble a global sharded batch from each host's LOCAL shard.

    Each process passes the (accum, local_batch, ...) arrays it loaded; the
    returned global arrays are (accum, local_batch * num_processes, ...) sharded
    over the mesh's 'data' axis without any cross-host copy of array data.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_proc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        spec = [None] * x.ndim
        spec[batch_axis] = "data"
        sharding = NamedSharding(mesh, P(*spec))
        global_shape = list(x.shape)
        global_shape[batch_axis] *= n_proc
        local_devices = [d for d in mesh.devices.flatten() if d.process_index == jax.process_index()]
        per_device = np.array_split(x, len(local_devices), axis=batch_axis)
        arrays = [jax.device_put(s, d) for s, d in zip(per_device, local_devices)]
        return jax.make_array_from_single_device_arrays(tuple(global_shape), sharding, arrays)

    return jax.tree.map(put, batch)


def gather_to_host(x: jax.Array) -> np.ndarray:
    """Fetch a (possibly sharded) global array to every host as numpy - the
    device-resident replacement for accelerate's gather_for_metrics/gather_object
    (reference scripts/general/generate_narration_texts.py:124-153)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return np.asarray(jax.device_get(x))
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
