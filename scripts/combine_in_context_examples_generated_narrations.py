#!/usr/bin/env python
"""Join generated narrations + annotations + in-context example maps into one
analysis JSONL.

CLI-parity target:
/root/reference/scripts/general/combine_in_context_examples_generated_narrations.py -
per query frame_path: the generated/ground-truth row, its structured verb/noun
from the annotation CSV, and the full annotation rows of its in-context examples.
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import argparse
import csv
import json


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--generated_narrations", required=True, help="CSV from generate_narration_texts.py")
    p.add_argument("--annotations", required=True, help="narrated_actions.csv for the eval split")
    p.add_argument("--in_context_examples", required=True, help="JSONL map from sample_in_context_examples.py")
    p.add_argument("--in_context_example_annotations", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    generated: dict[str, dict] = {}
    with open(args.generated_narrations, newline="") as f:
        for row in csv.DictReader(f):
            generated[row["frame_path"]] = dict(row)

    annotations: dict[str, dict] = {}
    with open(args.annotations, newline="") as f:
        for row in csv.DictReader(f):
            annotations[row["frame_path"]] = row
    assert not set(generated) - set(annotations), "missing annotations for some generations"

    icl: dict[str, dict] = {}
    with open(args.in_context_examples) as f:
        for line in f:
            data = json.loads(line)
            icl[data["query"]] = data
    assert set(generated) <= set(icl), "generated narrations without in-context maps"

    ctx_annotations: dict[str, dict] = {}
    with open(args.in_context_example_annotations, newline="") as f:
        for row in csv.DictReader(f):
            ctx_annotations[row["frame_path"]] = row
    used_ctx = {ex for fp in generated for ex in icl[fp]["context"]}
    assert not used_ctx - set(ctx_annotations), "missing in-context example annotations"

    with open(args.output, "w") as f:
        for frame_path, narration in generated.items():
            narration["structured_verb"] = annotations[frame_path]["structured_verb"]
            narration["structured_noun"] = annotations[frame_path]["structured_noun"]
            narration["context"] = [
                ctx_annotations[c] for c in icl[frame_path]["context"]
            ]
            f.write(json.dumps(narration) + "\n")
    print(f"wrote {len(generated)} combined rows to {args.output}")


if __name__ == "__main__":
    main()
