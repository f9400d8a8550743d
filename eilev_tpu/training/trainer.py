"""Training loop: the HF-Trainer role for this framework.

Reproduces the train_v1/train_v2 recipe (/root/reference/scripts/general/train_v2.py:
104-219 + slurm-scripts/README.md): frozen towers, grad accumulation to a global
batch, periodic eval + checkpointing (save_steps / save_total_limit /
load_best_at_end), resume-from-checkpoint, step-time and videos/sec meters
(the observability the reference lacks - SURVEY.md section 5), optional wandb.

TPU-native structure: ONE compiled step function (grad-accum scan inside), data
sharded over the mesh's "data" axis, a background host thread keeping a prefetch
queue of ready device batches so PNG decode/augmentation overlaps device compute
(the reference uses DataLoader worker processes for the same purpose).
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
import time
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import make_mesh, param_shardings
from .checkpoint import (
    AsyncCheckpointWriter,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from .train_state import (
    OptimizerConfig,
    TrainState,
    eval_step,
    make_optimizer,
    make_train_step,
    merge_params,
    partition_params,
    zero_sharded_opt_state,
)


@dataclasses.dataclass
class TrainerConfig:
    """HF TrainingArguments subset used by the reference recipe
    (slurm-scripts/train/submit_train_v2.py:22-37)."""

    output_dir: str = "checkpoints"
    num_train_steps: Optional[int] = 1000  # None = train until the data iterator ends
    per_device_batch_size: int = 1
    gradient_accumulation_steps: int = 16
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    eval_steps: int = 200
    save_steps: int = 200
    save_total_limit: int = 3
    log_steps: int = 10
    load_best_model_at_end: bool = True
    dropout: bool = True  # reference trains the Q-Former with its 0.1 dropouts
    seed: int = 42
    resume_from_checkpoint: bool = False
    prefetch: int = 2
    # ZeRO-2 equivalent: shard the optimizer moments over the "data" axis
    # (reference's optional DeepSpeed ZeRO-2, submit_train_v2.py:38-65)
    zero_shard_opt_state: bool = False
    # overlap checkpoint writes with training (orbax async); the final save
    # always commits before train() returns
    async_save: bool = False
    # > 1: pipeline the frozen LM layer stack over a "stage" mesh axis with
    # this many stages (GPipe; parallel/pipeline.py). The mesh becomes
    # ("data", "stage"); batch still shards over "data". Composes with
    # zero_shard_opt_state. Additive beyond the reference (SURVEY.md 2d).
    pipeline_parallel: int = 0
    # microbatches per GPipe schedule; the per-data-shard batch must divide it
    pipeline_microbatches: int = 4
    # (start, stop) step interval to capture a jax.profiler trace for,
    # written to <output_dir>/trace (view with xprof/tensorboard). The
    # reference has no profiling at all (SURVEY.md section 5).
    profile_steps: Optional[tuple] = None


class _Prefetcher:
    """Background thread pulling host batches and parking them on device."""

    def __init__(self, it: Iterable, put_fn: Callable[[Any], Any], depth: int):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._put = put_fn
        self._it = iter(it)
        self._done = object()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                self._q.put(self._put(item))
        except BaseException as e:  # propagate to the consumer
            self._error = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def _is_committed(x) -> bool:
    """True if the array is already placed on a multi-device mesh sharding."""
    sh = getattr(x, "sharding", None)
    return sh is not None and getattr(sh, "num_devices", 1) > 1


def shard_train_batch(batch: Any, mesh) -> Any:
    """Shard the MICRO-BATCH axis (axis 1; axis 0 is grad accumulation) over
    'data'. A micro axis that doesn't divide the data axis is a configuration
    error (it would silently replicate and waste an N-x of throughput), so it
    raises instead.

    Multi-process: ``batch`` is this HOST'S shard (loaded by
    ``train_batch_iterator(process_index=..., process_count=...)``); the
    host-local arrays assemble into one global sharded array with no
    cross-host data movement (parallel/distributed.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() > 1:
        from ..parallel.distributed import host_local_batch_to_global

        return host_local_batch_to_global(batch, mesh, batch_axis=1)

    n = mesh.shape["data"]

    def put(x):
        if x.ndim >= 2:
            if x.shape[1] % n != 0:
                raise ValueError(
                    f"micro-batch axis {x.shape[1]} does not divide the mesh "
                    f"data axis {n}; pick per_device_batch_size so that "
                    "micro_batch * videos_per_sample is a multiple of the data "
                    "axis (silent replication would cost the full data-parallel "
                    "speedup)"
                )
            return jax.device_put(x, NamedSharding(mesh, P(None, "data")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)


class Trainer:
    def __init__(
        self,
        model,
        params: dict,
        config: TrainerConfig,
        train_batches: Callable[[int], Iterable[dict]],
        eval_batches: Optional[Callable[[], Iterable[dict]]] = None,
        mesh=None,
        logger: Optional[Callable[[int, dict], None]] = None,
    ):
        """
        :param train_batches: fn(seed) -> iterable of host batches shaped
            (accum, micro_batch, ...) per array (see make_train_step).
        :param eval_batches: fn() -> iterable of eval batches (micro shape).
        :param logger: fn(step, metrics) - e.g. utils.logging.WandbLogger.
        """
        self.model = model
        self.config = config
        self._pp = config.pipeline_parallel > 1
        if mesh is not None:
            self.mesh = mesh
        elif self._pp:
            from ..parallel.pipeline import make_pipeline_mesh

            n = len(jax.devices())
            self.mesh = make_pipeline_mesh(
                config.pipeline_parallel, data=n // config.pipeline_parallel
            )
        else:
            self.mesh = make_mesh()
        if self._pp and "stage" not in self.mesh.shape:
            raise ValueError(
                "pipeline_parallel > 1 needs a mesh with a 'stage' axis "
                "(parallel.pipeline.make_pipeline_mesh)"
            )
        self.logger = logger
        self.train_batches = train_batches
        self.eval_batches = eval_batches

        trainable, frozen = partition_params(params)
        # place params on the mesh. With a model axis > 1 the tensor-parallel
        # layout from parallel.mesh.param_shardings applies (the --model_parallel
        # CLI path); otherwise everything replicates (pure DP, reference parity).
        # Pre-sharded `params` are respected as-is.
        from jax.sharding import NamedSharding, PartitionSpec as P

        tp = self.mesh.shape.get("model", 1) > 1
        train_sh = param_shardings(trainable, self.mesh, tensor_parallel=tp)
        trainable = jax.tree.map(
            lambda x, s: jax.device_put(x, s) if not _is_committed(x) else x,
            trainable, train_sh,
        )
        if self._pp:
            # frozen splits into (rest replicated, LM layer stacks sharded over
            # "stage") — the layer weights live only on their stage's devices
            from ..parallel.pipeline import shard_stacked
            from .pipeline_step import pp_partition_frozen

            rest, stacked = pp_partition_frozen(
                frozen, model.config, config.pipeline_parallel
            )
            rep_sh = NamedSharding(self.mesh, P())
            rest = jax.tree.map(lambda x: jax.device_put(x, rep_sh), rest)
            stacked = shard_stacked(stacked, self.mesh)
            frozen = (rest, stacked)
        else:
            froz_sh = param_shardings(frozen, self.mesh, tensor_parallel=tp)
            frozen = jax.tree.map(
                lambda x, s: jax.device_put(x, s) if not _is_committed(x) else x,
                frozen, froz_sh,
            )
        self.frozen = frozen
        tx = make_optimizer(config.optimizer)
        state = TrainState.create(trainable, tx)
        rep = NamedSharding(self.mesh, P())
        # ZeRO-2 equivalent: the optimizer moments (same shapes as the params)
        # shard over "data"; everything else follows the param layout.
        if config.zero_shard_opt_state:
            opt_sh = zero_sharded_opt_state(state, self.mesh)
        else:
            opt_sh = jax.tree.map(lambda _: rep, state.opt_state)
        state_sh = state.replace(
            step=rep,
            trainable=jax.tree.map(lambda x: x.sharding, trainable),
            opt_state=opt_sh,
        )
        self.state = jax.tree.map(jax.device_put, state, state_sh)
        # pin the output state to the same layout so the ZeRO/TP sharding
        # survives every step (GSPMD would otherwise be free to re-layout)
        if self._pp:
            from .pipeline_step import make_pp_eval_step, make_pp_train_step

            step_fn = make_pp_train_step(
                model,
                self.mesh,
                num_microbatches=config.pipeline_microbatches,
                accum_steps=config.gradient_accumulation_steps,
                dropout=config.dropout,
            )
            self._pp_eval_fn = jax.jit(
                make_pp_eval_step(
                    model, self.mesh, num_microbatches=config.pipeline_microbatches
                )
            )
        else:
            step_fn = make_train_step(
                model,
                accum_steps=config.gradient_accumulation_steps,
                dropout=config.dropout,
            )
            self._eval_fn = jax.jit(lambda p, b: eval_step(model, p, b))
        self._step_fn = jax.jit(
            step_fn,
            # NOTE: no donation — device_put of a replicated layout can alias
            # the caller's buffers (observed on the CPU backend), and the
            # trainable subtree is small (towers are frozen).
            out_shardings=(state_sh, {"loss": rep, "grad_norm": rep}),
        )
        self.best_eval_loss = float("inf")
        self.best_trainable = None
        self._ckpt_writer: Optional[AsyncCheckpointWriter] = None

        if config.resume_from_checkpoint:
            path = latest_checkpoint(config.output_dir)
            if path is not None:
                self.state, best = restore_checkpoint(path, self.state, with_best=True)
                if best is not None:
                    self.best_eval_loss, self.best_trainable = best

    def current_params(self) -> dict:
        if self._pp:
            from .pipeline_step import pp_unpartition_frozen

            rest, stacked = self.frozen
            return merge_params(
                self.state.trainable,
                pp_unpartition_frozen(rest, stacked, self.model.config),
            )
        return merge_params(self.state.trainable, self.frozen)

    def evaluate(self) -> float:
        assert self.eval_batches is not None
        params = None if self._pp else self.current_params()
        losses = []
        for batch in self.eval_batches():
            batch = jax.tree.map(jnp.asarray, batch)
            n = self.mesh.shape["data"]
            from jax.sharding import NamedSharding, PartitionSpec as P

            def put(x):
                # like shard_train_batch: a non-dividing batch axis would
                # silently replicate and eat the full data-parallel speedup,
                # so it is a configuration error here too
                if x.ndim == 0:
                    return jax.device_put(x, NamedSharding(self.mesh, P()))
                if x.shape[0] % n != 0:
                    raise ValueError(
                        f"eval batch axis {x.shape[0]} does not divide the "
                        f"mesh data axis {n}; size eval batches to a multiple "
                        "of the data axis"
                    )
                return jax.device_put(x, NamedSharding(self.mesh, P("data")))

            batch = jax.tree.map(put, batch)
            if self._pp:
                rest, stacked = self.frozen
                losses.append(
                    float(self._pp_eval_fn(self.state.trainable, rest, stacked, batch))
                )
            else:
                losses.append(float(self._eval_fn(params, batch)))
        return float(np.mean(losses)) if losses else float("nan")

    def train(self) -> TrainState:
        cfg = self.config
        start_step = int(self.state.step)
        it = _Prefetcher(
            self.train_batches(cfg.seed + start_step),
            lambda b: shard_train_batch(jax.tree.map(jnp.asarray, b), self.mesh),
            cfg.prefetch,
        )
        t_last = time.perf_counter()
        videos_since = 0
        tracing = False
        for batch in it:
            if cfg.num_train_steps is not None and int(self.state.step) >= cfg.num_train_steps:
                break
            if cfg.profile_steps is not None:
                lo, hi = cfg.profile_steps
                now_step = int(self.state.step)
                if not tracing and now_step == lo:
                    jax.profiler.start_trace(
                        str(os.path.join(cfg.output_dir, "trace"))
                    )
                    tracing = True
                elif tracing and now_step >= hi:
                    jax.profiler.stop_trace()
                    tracing = False
            self.state, metrics = self._step_fn(self.state, self.frozen, batch)
            step = int(self.state.step)
            if "pixel_values" in batch:
                videos_since += int(np.prod(batch["pixel_values"].shape[:2]))

            if step % cfg.log_steps == 0:
                now = time.perf_counter()
                dt = now - t_last
                logd = {
                    "loss": float(metrics["loss"]),
                    "grad_norm": float(metrics["grad_norm"]),
                    "step_time_sec": dt / cfg.log_steps,
                    "videos_per_sec": videos_since / dt if dt > 0 else 0.0,
                }
                t_last = now
                videos_since = 0
                if self.logger:
                    self.logger(step, logd)
                else:
                    print(f"step {step}: {logd}")

            if cfg.eval_steps and self.eval_batches is not None and step % cfg.eval_steps == 0:
                eval_loss = self.evaluate()
                if self.logger:
                    self.logger(step, {"eval_loss": eval_loss})
                if eval_loss < self.best_eval_loss:
                    self.best_eval_loss = eval_loss
                    self.best_trainable = jax.tree.map(lambda x: x, self.state.trainable)

            if cfg.save_steps and step % cfg.save_steps == 0:
                self._save(cfg)

        if cfg.load_best_model_at_end and self.best_trainable is not None:
            self.state = self.state.replace(trainable=self.best_trainable)
        self._save(cfg, final=True)
        return self.state

    def _save(self, cfg: TrainerConfig, final: bool = False) -> None:
        """Periodic saves overlap compute when cfg.async_save; the final save
        always commits before returning."""
        if cfg.async_save:
            if self._ckpt_writer is None:
                self._ckpt_writer = AsyncCheckpointWriter()
            self._ckpt_writer.save(
                cfg.output_dir, self.state, keep=cfg.save_total_limit,
                best=self._best_payload(),
            )
            if final:
                self._ckpt_writer.wait()
        else:
            save_checkpoint(
                cfg.output_dir, self.state, keep=cfg.save_total_limit,
                best=self._best_payload(),
            )

    def _best_payload(self):
        """Best-eval snapshot persisted alongside the state so
        load_best_model_at_end survives preemption (the reference gets this via
        HF Trainer checkpoints)."""
        if self.best_trainable is None:
            return None
        return (self.best_eval_loss, self.best_trainable)
