#!/usr/bin/env python
"""VideoBLIP (v1) training: single-video narration fine-tuning with a fixed
instruction prompt.

CLI-parity target: /root/reference/scripts/general/train_v1.py (prompt
'Question: What is the camera wearer doing? Answer:', FrameDataset with
subsample-only transform, frozen towers; README.md:204: batch 32 x accum 4 on
one accelerator).
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

import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_name_or_path", required=True)
    p.add_argument("--num_subsample_frames", type=int, default=8)
    p.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--train_frames_dir", required=True)
    p.add_argument("--val_frames_dir", required=True)
    p.add_argument("--train_annotation_file", default=None)
    p.add_argument("--val_annotation_file", default=None)
    p.add_argument("--max_length", type=int, default=64)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--num_train_steps", type=int, default=5000)
    p.add_argument("--remat", action="store_true",
                   help="per-layer remat of the frozen LM trunk (see train_v2.py)")
    p.add_argument("--per_device_train_batch_size", type=int, default=32)
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--eval_steps", type=int, default=200)
    p.add_argument("--save_steps", type=int, default=200)
    p.add_argument("--save_total_limit", type=int, default=3)
    p.add_argument("--logging_steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resume_from_checkpoint", action="store_true")
    p.add_argument("--wandb_project", default=None)
    p.add_argument("--data_parallel", type=int, default=None)
    return p.parse_args()


def main() -> None:
    args = parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    from eilev_tpu.data.frame import FrameDataset
    from eilev_tpu.models.auto import load_model, load_tokenizer
    from eilev_tpu.parallel import make_mesh
    from eilev_tpu.training import OptimizerConfig
    from eilev_tpu.training.data_module import train_batch_iterator
    from eilev_tpu.training.trainer import Trainer, TrainerConfig
    from eilev_tpu.utils import WandbLogger

    model, variables, config = load_model(
        args.model_name_or_path, version="v1", dtype=dtype, remat=args.remat
    )
    tokenizer = load_tokenizer(args.model_name_or_path)
    mesh = make_mesh(data=args.data_parallel, model=1)
    micro = args.per_device_train_batch_size * mesh.shape["data"]

    train_data = FrameDataset(args.train_frames_dir, annotation_file=args.train_annotation_file)
    val_data = FrameDataset(args.val_frames_dir, annotation_file=args.val_annotation_file)
    decoder_only = config.use_decoder_only_language_model

    def batches(dataset, augment, seed, epochs=None, accum=None):
        return train_batch_iterator(
            dataset,
            tokenizer,
            num_query_tokens=config.num_query_tokens,
            decoder_only_lm=decoder_only,
            accum_steps=accum if accum is not None else args.gradient_accumulation_steps,
            micro_batch_size=micro,
            max_length=args.max_length,
            num_frames=args.num_subsample_frames,
            image_size=config.vision_config.image_size,
            augment=augment,
            seed=seed,
            epochs=epochs,
            dtype=dtype,
            interleaved=False,
        )

    def eval_batches():
        for batch in batches(val_data, False, 0, epochs=1, accum=1):
            yield {k: v[0] for k, v in batch.items()}

    trainer = Trainer(
        model,
        variables["params"],
        TrainerConfig(
            output_dir=args.output_dir,
            num_train_steps=args.num_train_steps,
            per_device_batch_size=args.per_device_train_batch_size,
            gradient_accumulation_steps=args.gradient_accumulation_steps,
            optimizer=OptimizerConfig(
                learning_rate=args.learning_rate,
                warmup_steps=args.warmup_steps,
                total_steps=args.num_train_steps,
                weight_decay=args.weight_decay,
            ),
            eval_steps=args.eval_steps,
            save_steps=args.save_steps,
            save_total_limit=args.save_total_limit,
            log_steps=args.logging_steps,
            seed=args.seed,
            resume_from_checkpoint=args.resume_from_checkpoint,
        ),
        train_batches=lambda seed: batches(train_data, False, seed),  # v1: subsample-only transform
        eval_batches=eval_batches,
        mesh=mesh,
        logger=WandbLogger(project=args.wandb_project, enabled=args.wandb_project is not None),
    )
    trainer.train()


if __name__ == "__main__":
    main()
