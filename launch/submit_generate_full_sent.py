#!/usr/bin/env python
"""Generate + submit a baseline sentence-ification job (TPU VM or SLURM).

Role-parity target:
/root/reference/slurm-scripts/icl-eval/submit_videomae_generate_full_sent.py and
/root/reference/slurm-scripts/icl-eval/submit_majority_generate_full_sent.py —
the reference runs Llama-2-chat over the VideoMAE / majority-baseline predicted
classes; here the same CLIs run TextLM (LLaMA- or OPT-family local checkpoint)
on a TPU VM. ``--mode`` picks the baseline.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from launch_lib import add_common_args, finish  # noqa: E402

SCRIPTS = {
    "videomae": "scripts/baselines/videomae_generate_full_sent.py",
    "majority": "scripts/baselines/majority_generate_full_sent.py",
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--mode", choices=sorted(SCRIPTS), required=True)
    p.add_argument("gen_args", nargs=argparse.REMAINDER,
                   help="args for the *_generate_full_sent.py script")
    args = p.parse_args()

    script_args = [a for a in args.gen_args if a != "--"]
    finish(args, f"{args.mode}-generate-full-sent", SCRIPTS[args.mode], script_args, forward_wandb=False)


if __name__ == "__main__":
    main()
