#!/usr/bin/env python
"""Generate + submit an EILeV v2 training job (TPU VM or SLURM).

Role-parity target: /root/reference/slurm-scripts/train/submit_train_v2.py -
computes gradient accumulation from the global train batch (the reference's
recipe: global batch 128 = accum 16 x 8 GPUs x per-device 1; here accum =
global / (per_device x data_parallel chips)), forwards remaining args to
scripts/train_v2.py. The DeepSpeed ZeRO-2 flag becomes optimizer-state sharding
inside the train step (no external runtime needed).

Resource guide (v5e; reference A40 numbers in slurm-scripts/README.md):
  blip2-opt-2.7b / blip2-flan-t5-xl, 16-shot, global batch 128:
    v5e-8, bf16, per-device batch 1-2, ~1 day wall clock budget.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from launch_lib import add_common_args, finish  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--num_chips", type=int, required=True, help="data-parallel chips")
    p.add_argument("--train_batch_size", type=int, required=True, help="global batch")
    p.add_argument("--per_device_train_batch_size", type=int, default=1)
    p.add_argument("train_args", nargs=argparse.REMAINDER, help="args for scripts/train_v2.py")
    args = p.parse_args()

    accum = args.train_batch_size // (args.num_chips * args.per_device_train_batch_size)
    assert accum * args.num_chips * args.per_device_train_batch_size == args.train_batch_size
    script_args = [
        "--data_parallel", str(args.num_chips),
        "--per_device_train_batch_size", str(args.per_device_train_batch_size),
        "--gradient_accumulation_steps", str(accum),
    ] + [a for a in args.train_args if a != "--"]
    finish(args, "eilev-train-v2", "scripts/train_v2.py", script_args)


if __name__ == "__main__":
    main()
