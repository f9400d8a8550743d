#!/usr/bin/env python
"""Generate + submit a verb/noun ICL classification eval job.

Role-parity target: /root/reference/slurm-scripts/icl-eval/submit_icl_eval.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from launch_lib import add_common_args, finish  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("eval_args", nargs=argparse.REMAINDER, help="args for scripts/icl_eval.py")
    args = p.parse_args()
    finish(args, "eilev-icl-eval", "scripts/icl_eval.py", [a for a in args.eval_args if a != "--"])


if __name__ == "__main__":
    main()
