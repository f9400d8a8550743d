#!/usr/bin/env python
"""Generate + submit a batched narration-generation job.

Role-parity target: /root/reference/slurm-scripts/icl-eval/
submit_generate_narration_texts.py. Reference budgets (slurm-scripts/README.md):
0-shot batch 32 on 1xA40 in 6h; 16-shot batch 1/GPU on 4xA40 in 24h. On a v5e
chip the measured 16-shot throughput is ~23 videos/sec at batch 4 (bench.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from launch_lib import add_common_args, finish  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("gen_args", nargs=argparse.REMAINDER, help="args for scripts/generate_narration_texts.py")
    args = p.parse_args()
    finish(
        args,
        "eilev-generate-narrations",
        "scripts/generate_narration_texts.py",
        [a for a in args.gen_args if a != "--"],
    )


if __name__ == "__main__":
    main()
