#!/usr/bin/env python
"""Filter the combined analysis JSONL by a metric threshold.

CLI-parity target: /root/reference/scripts/general/select_qualitative_examples.py.
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--combined_jsonl", required=True)
    p.add_argument("--metric", default="rougeL", help="per-row metric column to threshold")
    p.add_argument("--threshold", type=float, required=True)
    p.add_argument("--above", action="store_true", help="keep rows >= threshold (default <=)")
    p.add_argument("--output", required=True)
    args = p.parse_args()

    kept = 0
    with open(args.combined_jsonl) as inf, open(args.output, "w") as outf:
        for line in inf:
            row = json.loads(line)
            if args.metric not in row:
                # compute ROUGE-L on the fly if absent
                from eilev_tpu.eval.metrics import rouge_l

                row[args.metric] = rouge_l([row["generated"]], [row["ground_truth"]])
            v = float(row[args.metric])
            if (v >= args.threshold) if args.above else (v <= args.threshold):
                outf.write(json.dumps(row) + "\n")
                kept += 1
    print(f"kept {kept} rows -> {args.output}")


if __name__ == "__main__":
    main()
