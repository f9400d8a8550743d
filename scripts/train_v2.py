#!/usr/bin/env python
"""EILeV (v2) training: interleaved 16-shot fine-tuning of Q-Former + projection
+ query tokens on frozen towers.

CLI-parity target: /root/reference/scripts/general/train_v2.py (+ the recipe in
slurm-scripts/README.md:10-18 - global batch 128 = accum 16 x 8-way data
parallel, lr 1e-4, warmup, bf16). On TPU the 8-way DDP becomes the mesh's
"data" axis under one jit.

Example:
  python scripts/train_v2.py \
    --model_name_or_path /path/to/blip2-opt-2.7b \
    --train_frames_dir ... --val_frames_dir ... \
    --num_subsample_frames 8 --train_num_in_context_examples_per_sample 16 \
    --val_num_in_context_examples_per_sample 16 --verb_noun_ratio 0.5 \
    --output_dir checkpoints/eilev-opt
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))
# honor JAX_PLATFORMS even under the axon TPU plugin (which overrides the env var)
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass


import argparse
import random

import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    # model
    p.add_argument("--model_name_or_path", required=True, help="HF save_pretrained dir")
    p.add_argument("--num_subsample_frames", type=int, default=8)
    p.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    # data (reference DataArguments)
    p.add_argument("--train_frames_dir", required=True)
    p.add_argument("--val_frames_dir", required=True)
    p.add_argument("--train_annotation_file", default=None)
    p.add_argument("--val_annotation_file", default=None)
    p.add_argument("--train_num_in_context_examples_per_sample", type=int, default=16)
    p.add_argument("--val_num_in_context_examples_per_sample", type=int, default=16)
    p.add_argument("--verb_noun_ratio", type=float, default=0.5)
    p.add_argument("--random_in_context_examples", action="store_true")
    p.add_argument("--train_target_dataset_len", type=int, default=None)
    p.add_argument("--max_length", type=int, default=1024, help="static token bucket")
    p.add_argument("--num_workers", type=int, default=0,
                   help="thread-pool workers overlapping frame IO + tokenization"
                   " (bit-identical batches to serial; reference: DataLoader workers)")
    # training (reference TrainingArguments subset)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--num_train_steps", type=int, default=None,
                   help="step cap; default derives from --num_train_epochs")
    p.add_argument("--num_train_epochs", type=int, default=5,
                   help="reference recipe trains 5 epochs (README.md:152-155)")
    p.add_argument("--zero_shard_opt_state", action="store_true",
                   help="ZeRO-2-equivalent: shard optimizer moments over the data axis")
    p.add_argument("--async_save", action="store_true",
                   help="overlap orbax checkpoint writes with training compute")
    p.add_argument("--remat", action="store_true",
                   help="per-layer rematerialization of the frozen LM trunk: "
                        "store only layer-boundary activations, recompute the "
                        "rest in backward — lifts the activation-memory wall "
                        "that pins the reference to micro-batch 1, enabling "
                        "--per_device_train_batch_size > 1")
    p.add_argument("--per_device_train_batch_size", type=int, default=1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="> 0: keep an EMA of the trainable params in the "
                        "optimizer state (checkpoint/ZeRO-compatible)")
    p.add_argument("--eval_steps", type=int, default=200)
    p.add_argument("--save_steps", type=int, default=200)
    p.add_argument("--save_total_limit", type=int, default=3)
    p.add_argument("--logging_steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resume_from_checkpoint", action="store_true")
    p.add_argument("--wandb_project", default=None)
    p.add_argument("--data_parallel", type=int, default=None, help="mesh data axis size")
    p.add_argument("--multihost", action="store_true",
                   help="multi-process SPMD: jax.distributed.initialize + per-host "
                        "sharded data loading (reference: torchrun c10d multi-node); "
                        "set --eval_steps 0 (periodic eval is single-host)")
    p.add_argument("--model_parallel", type=int, default=1, help="mesh model (TP) axis size")
    p.add_argument("--pipeline_parallel", type=int, default=0,
                   help="> 1: GPipe the frozen LM layer stack over this many "
                        "pipeline stages (mesh becomes (data, stage); "
                        "exclusive with --model_parallel)")
    p.add_argument("--pipeline_microbatches", type=int, default=4,
                   help="GPipe microbatches; per-data-shard batch must divide it")
    p.add_argument("--export_hf", action="store_true", help="export final model as safetensors")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    from eilev_tpu.data.frame import FrameInterleavedDataset
    from eilev_tpu.models.auto import load_model, load_tokenizer
    from eilev_tpu.parallel import make_mesh
    from eilev_tpu.training import OptimizerConfig
    from eilev_tpu.training.data_module import train_batch_iterator
    from eilev_tpu.training.trainer import Trainer, TrainerConfig
    from eilev_tpu.utils import WandbLogger

    if args.multihost:
        from eilev_tpu.parallel.distributed import initialize

        initialize()

    model, variables, config = load_model(
        args.model_name_or_path, dtype=dtype, remat=args.remat
    )
    tokenizer = load_tokenizer(args.model_name_or_path)

    if args.pipeline_parallel > 1:
        if args.model_parallel > 1:
            raise ValueError("--pipeline_parallel and --model_parallel are exclusive")
        if args.remat:
            # The PP trunk runs the LM layers outside flax via shard_map
            # (training/pipeline_step.py) and never consults config.remat;
            # per-microbatch staging is PP's own activation strategy.
            raise ValueError(
                "--remat has no effect under --pipeline_parallel (the pipeline "
                "trunk manages activations per microbatch); drop --remat"
            )
        from eilev_tpu.parallel.pipeline import make_pipeline_mesh

        data = args.data_parallel or len(jax.devices()) // args.pipeline_parallel
        mesh = make_pipeline_mesh(args.pipeline_parallel, data=data)
    else:
        mesh = make_mesh(data=args.data_parallel, model=args.model_parallel)
    micro = args.per_device_train_batch_size * mesh.shape["data"]
    # each host loads its stride of the dataset and 1/num_processes of the
    # global micro batch; shard_train_batch assembles the global array
    n_proc = jax.process_count()
    if micro % n_proc != 0:
        # silent truncation would shrink the assembled global micro-batch below
        # the `micro` used for steps_per_epoch / the LR schedule
        raise ValueError(
            f"global micro-batch {micro} (per_device_train_batch_size * data "
            f"axis) must be divisible by the process count {n_proc}"
        )
    micro_local = micro // n_proc

    train_data = FrameInterleavedDataset(
        args.train_frames_dir,
        annotation_file=args.train_annotation_file,
        num_in_context_examples_per_sample=args.train_num_in_context_examples_per_sample,
        verb_noun_ratio=args.verb_noun_ratio,
        random_in_context_examples=args.random_in_context_examples,
        target_dataset_len=args.train_target_dataset_len,
        rng=random.Random(args.seed),
    )
    val_data = FrameInterleavedDataset(
        args.val_frames_dir,
        annotation_file=args.val_annotation_file,
        in_context_example_frames_dir=args.train_frames_dir,
        in_context_example_annotation_file=args.train_annotation_file,
        num_in_context_examples_per_sample=args.val_num_in_context_examples_per_sample,
        verb_noun_ratio=args.verb_noun_ratio,
        random_in_context_examples=args.random_in_context_examples,
        rng=random.Random(args.seed + 1),
    )

    decoder_only = config.use_decoder_only_language_model

    # epoch accounting (reference: 5 epochs at global batch 128)
    global_batch = micro * args.gradient_accumulation_steps
    steps_per_epoch = max(len(train_data) // global_batch, 1)
    total_steps = (
        args.num_train_steps
        if args.num_train_steps is not None
        else steps_per_epoch * args.num_train_epochs
    )

    def train_batches(seed):
        return train_batch_iterator(
            train_data,
            tokenizer,
            num_query_tokens=config.num_query_tokens,
            decoder_only_lm=decoder_only,
            accum_steps=args.gradient_accumulation_steps,
            micro_batch_size=micro_local,
            process_index=jax.process_index(),
            process_count=n_proc,
            max_length=args.max_length,
            num_frames=args.num_subsample_frames,
            image_size=config.vision_config.image_size,
            augment=True,
            seed=seed,
            epochs=args.num_train_epochs if args.num_train_steps is None else None,
            dtype=dtype,
            num_workers=args.num_workers,
        )

    def eval_batches():
        it = train_batch_iterator(
            val_data,
            tokenizer,
            num_query_tokens=config.num_query_tokens,
            decoder_only_lm=decoder_only,
            accum_steps=1,
            micro_batch_size=micro,
            max_length=args.max_length,
            num_frames=args.num_subsample_frames,
            image_size=config.vision_config.image_size,
            augment=False,  # deterministic val transform (reference :182-199)
            seed=0,
            epochs=1,
            dtype=dtype,
        )
        for batch in it:
            yield {k: v[0] for k, v in batch.items()}  # drop accum axis

    trainer = Trainer(
        model,
        variables["params"],
        TrainerConfig(
            output_dir=args.output_dir,
            num_train_steps=total_steps,
            per_device_batch_size=args.per_device_train_batch_size,
            gradient_accumulation_steps=args.gradient_accumulation_steps,
            zero_shard_opt_state=args.zero_shard_opt_state,
            async_save=args.async_save,
            pipeline_parallel=args.pipeline_parallel,
            pipeline_microbatches=args.pipeline_microbatches,
            optimizer=OptimizerConfig(
                learning_rate=args.learning_rate,
                warmup_steps=args.warmup_steps,
                total_steps=total_steps,
                weight_decay=args.weight_decay,
                ema_decay=args.ema_decay,
            ),
            eval_steps=args.eval_steps,
            save_steps=args.save_steps,
            save_total_limit=args.save_total_limit,
            log_steps=args.logging_steps,
            seed=args.seed,
            resume_from_checkpoint=args.resume_from_checkpoint,
        ),
        train_batches=train_batches,
        eval_batches=eval_batches,
        mesh=mesh,
        logger=WandbLogger(project=args.wandb_project, enabled=args.wandb_project is not None),
    )
    trainer.train()

    if args.export_hf:
        from eilev_tpu.training.checkpoint import export_hf_safetensors

        export_hf_safetensors(trainer.current_params(), config, args.output_dir + "/hf")
        print(f"exported HF safetensors to {args.output_dir}/hf")


if __name__ == "__main__":
    main()
