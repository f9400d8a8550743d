"""Worker for the true multi-process multi-host test (spawned by
test_multiprocess.py). Each process owns 2 virtual CPU devices; together they
form a 4-device 'data' mesh — the same topology as two TPU hosts on one pod
slice (reference equivalent: torchrun 2-node NCCL rendezvous)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

proc_id = int(sys.argv[1])
coordinator = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from eilev_tpu.parallel.distributed import (  # noqa: E402
    gather_to_host,
    host_local_batch_to_global,
    initialize,
)

initialize(coordinator_address=coordinator, num_processes=2, process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4 and jax.local_device_count() == 2

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from eilev_tpu import configs  # noqa: E402
from eilev_tpu.models import VideoBlipForConditionalGeneration  # noqa: E402
from eilev_tpu.parallel import make_mesh, param_shardings  # noqa: E402
from eilev_tpu.training import (  # noqa: E402
    TrainState,
    make_train_step,
    partition_params,
)

mesh = make_mesh(data=4, model=1)

# --- host_local_batch_to_global: each process contributes its local half ---
cfg = configs.tiny_config(text_model="opt")
img = cfg.vision_config.image_size
q = cfg.num_query_tokens
rng = np.random.default_rng(7)  # same on both processes
b_global, seq = 4, 12
ids_g = rng.integers(4, cfg.text_config.vocab_size, size=(b_global, seq))
pix_g = rng.normal(size=(b_global, 3, 2, img, img)).astype(np.float32)
vim_g = np.zeros((b_global, seq), np.int64)
vim_g[:, 1 : 1 + q] = 1
labels_g = np.where(vim_g.astype(bool), -100, ids_g)

lo, hi = proc_id * 2, proc_id * 2 + 2  # this host's shard of the global batch
local = {
    "input_ids": ids_g[None, lo:hi],
    "attention_mask": np.ones((1, 2, seq), np.int64),
    "labels": labels_g[None, lo:hi],
    "video_input_mask": vim_g[None, lo:hi],
    "pixel_values": pix_g[None, lo:hi],
}
batch = host_local_batch_to_global(local, mesh)
assert batch["input_ids"].shape == (1, 4, seq), batch["input_ids"].shape

# --- one SPMD train step across both processes ---
model = VideoBlipForConditionalGeneration(cfg)
params = jax.jit(
    lambda k: model.init(
        k,
        input_ids=jnp.asarray(ids_g),
        pixel_values=jnp.asarray(pix_g),
        video_input_mask=jnp.asarray(vim_g),
    )["params"]
)(jax.random.PRNGKey(0))
trainable, frozen = partition_params(params)
sh = param_shardings(params, mesh, tensor_parallel=False)
tsh = param_shardings(trainable, mesh)
fsh = param_shardings(frozen, mesh)
trainable = jax.tree.map(jax.device_put, trainable, tsh)
frozen = jax.tree.map(jax.device_put, frozen, fsh)

import optax  # noqa: E402

state = TrainState.create(trainable, optax.sgd(1e-2))
step = jax.jit(make_train_step(model, accum_steps=1, dropout=False))
state, metrics = step(state, frozen, batch)
loss = float(metrics["loss"])
assert np.isfinite(loss), loss

# --- shard_train_batch: the multi-process branch the Trainer prefetcher uses ---
from eilev_tpu.training.trainer import shard_train_batch  # noqa: E402

assembled = shard_train_batch(local, mesh)
assert assembled["input_ids"].shape == (1, 4, seq), assembled["input_ids"].shape
assert "data" in str(assembled["input_ids"].sharding.spec)
# both hosts' shards reassemble the global batch (checked after the gather
# import below via the process allgather, since non-addressable shards can't
# device_get directly)

# --- gather_to_host: the allgather branch (process_count > 1) ---
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

local_vals = np.arange(proc_id * 2, proc_id * 2 + 2, dtype=np.float32)
sharded = host_local_batch_to_global({"x": local_vals[None]}, mesh)["x"]
gathered = gather_to_host(sharded)
np.testing.assert_array_equal(gathered.reshape(-1), np.arange(4, dtype=np.float32))

# shard_train_batch assembly content check (deferred from above)
np.testing.assert_array_equal(
    gather_to_host(assembled["input_ids"]).reshape(b_global, seq), ids_g
)

print(f"RESULT {proc_id} loss={loss:.6f} gather=ok", flush=True)
