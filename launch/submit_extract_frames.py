#!/usr/bin/env python
"""Generate + submit an offline frame-extraction job.

Role-parity target: /root/reference/slurm-scripts/extract-frames/.
Extraction is host-CPU-bound (libav decode); it needs no accelerator, so the
SLURM backend with plenty of CPUs is usually the right choice.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from launch_lib import add_common_args, finish  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--dataset", choices=["ego4d", "epic_kitchens"], default="ego4d")
    p.add_argument("extract_args", nargs=argparse.REMAINDER)
    args = p.parse_args()
    script = (
        "scripts/ego4d/extract_frames.py"
        if args.dataset == "ego4d"
        else "scripts/epic_kitchens/epic_kitchens_extract_frames.py"
    )
    finish(args, f"extract-frames-{args.dataset}", script, [a for a in args.extract_args if a != "--"])


if __name__ == "__main__":
    main()
