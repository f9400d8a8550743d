#!/usr/bin/env python
"""Generate + submit a VideoMAE verb/noun classifier training job (TPU VM or SLURM).

Role-parity target: /root/reference/slurm-scripts/train/submit_videomae_train.py
(the VideoMAE baseline fine-tune; the reference runs it torchrun multi-GPU with
optional DeepSpeed ZeRO-2 — here it is a single-controller JAX job on a TPU VM,
forwarding args to scripts/baselines/videomae_train.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from launch_lib import add_common_args, finish  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--verb", action="store_true", help="train the verb classifier (else noun)")
    p.add_argument("--train_batch_size", type=int, default=None,
                   help="global batch forwarded as --batch_size")
    p.add_argument("train_args", nargs=argparse.REMAINDER,
                   help="args for scripts/baselines/videomae_train.py")
    args = p.parse_args()

    script_args = []
    if args.verb:
        script_args.append("--verb")
    if args.train_batch_size is not None:
        script_args += ["--batch_size", str(args.train_batch_size)]
    script_args += [a for a in args.train_args if a != "--"]
    name = "videomae-train-" + ("verb" if args.verb else "noun")
    finish(args, name, "scripts/baselines/videomae_train.py", script_args, forward_wandb=False)


if __name__ == "__main__":
    main()
