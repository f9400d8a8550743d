#!/usr/bin/env python
"""Score generated narrations against ground truth.

CLI-parity target: /root/reference/scripts/general/generation_eval.py - reads the
CSV written by generate_narration_texts.py and computes the metric suite (BLEU,
ROUGE-L always; BERTScore / STS bi-encoder / STS cross-encoder when local model
checkpoints are supplied - this environment has no Hub egress).
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
import csv
import json


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_csv", required=True)
    p.add_argument("--generated_column", default="generated")
    p.add_argument("--ground_truth_column", default="ground_truth")
    p.add_argument("--bert_score_model", default=None, help="local checkpoint dir")
    p.add_argument("--sts_biencoder_model", default=None, help="e.g. local all-mpnet-base-v2")
    p.add_argument("--sts_crossencoder_model", default=None, help="e.g. local stsb-roberta-large")
    p.add_argument("--output_json", default=None)
    p.add_argument("--wandb_project", default=None)
    args = p.parse_args()

    from eilev_tpu.eval.metrics import generation_metric_suite
    from eilev_tpu.utils import WandbLogger

    preds, refs = [], []
    with open(args.input_csv, newline="") as f:
        for row in csv.DictReader(f):
            preds.append(row[args.generated_column])
            refs.append(row[args.ground_truth_column])

    metrics = generation_metric_suite(
        preds,
        refs,
        bert_score_model=args.bert_score_model,
        sts_biencoder_model=args.sts_biencoder_model,
        sts_crossencoder_model=args.sts_crossencoder_model,
    )
    print(json.dumps(metrics, indent=2))
    WandbLogger(project=args.wandb_project, enabled=args.wandb_project is not None)(0, metrics)
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(metrics, f)


if __name__ == "__main__":
    main()
