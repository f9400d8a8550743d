#!/usr/bin/env python
"""Quality-parity gate: replay the published EILeV quality table end to end.

Given a mounted HF checkpoint (e.g. kpyu/eilev-blip2-opt-2.7b exported locally)
and an extracted-frames dir, this runs the full eval pipeline per shot count —
sample ICL maps -> batched narration generation -> metric suite — and diffs the
result against the PUBLISHED numbers (reference
figures/icl_eval_figures.ipynb cell 3, embedded in eilev_tpu/eval/published.py).
One command, prints a PASS/FAIL table, exit code 1 on failure.

This is the only proof of *functional* equivalence at full scale
(BASELINE.md north star: token-identical greedy narrations).

Full run:
  python scripts/verify_quality.py \\
    --model /ckpts/eilev-blip2-opt-2.7b \\
    --eval_frames_dir frames/val --in_context_frames_dir frames/train \\
    --sts_biencoder_model /ckpts/all-mpnet-base-v2 \\
    --num_shots 0 16 --tolerance 0.02

Mocked mode (CI / pre-generated narrations): skip generation, score existing CSVs:
  python scripts/verify_quality.py --generated_csv 0=gen0.csv 16=gen16.csv \\
    --tolerance 0.02
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import argparse
import csv
import json
import os
import subprocess
import sys
import tempfile

SCRIPTS = os.path.dirname(os.path.abspath(__file__))


def parse_args():
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    # full-pipeline inputs
    p.add_argument("--model", default=None, help="HF save_pretrained dir (full run)")
    p.add_argument("--eval_frames_dir", default=None)
    p.add_argument("--eval_annotation_file", default=None)
    p.add_argument("--in_context_frames_dir", default=None)
    p.add_argument("--in_context_annotation_file", default=None)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_eval_datapoints", type=int, default=None)
    p.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--verb_noun_ratio", type=float, default=0.5)
    p.add_argument("--random_seed", type=int, default=42)
    # mocked mode
    p.add_argument("--generated_csv", nargs="*", default=None,
                   help="SHOT=PATH pairs of pre-generated narration CSVs")
    # scoring / comparison
    p.add_argument("--num_shots", nargs="*", type=int, default=[0, 16])
    p.add_argument("--published_table", default="ego4d-opt-2.7b",
                   choices=["ego4d-opt-2.7b", "ego4d-flan-t5-xl",
                            "epic-kitchens-opt-2.7b", "novel-opt-2.7b"])
    p.add_argument("--tolerance", type=float, default=0.02,
                   help="absolute metric tolerance vs published")
    p.add_argument("--sts_biencoder_model", default=None,
                   help="local all-mpnet-base-v2 dir (needed for the STS-BE column)")
    p.add_argument("--bert_score_model", default=None)
    p.add_argument("--output_json", default=None)
    p.add_argument("--work_dir", default=None, help="keep intermediate files here")
    return p.parse_args()


def run_pipeline(args, shot: int, work: str) -> str:
    """sample ICL map -> generate narrations; returns the generated CSV path."""
    prefix = os.path.join(work, f"icl-{shot}shot")
    subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "sample_in_context_examples.py"),
         "--in_context_frames_dir", args.in_context_frames_dir,
         *(["--in_context_annotation_file", args.in_context_annotation_file]
           if args.in_context_annotation_file else []),
         "--eval_frames_dir", args.eval_frames_dir,
         *(["--eval_annotation_file", args.eval_annotation_file]
           if args.eval_annotation_file else []),
         "--num_shot", str(shot), "--output_prefix", prefix,
         "--verb_noun_ratio", str(args.verb_noun_ratio),
         "--random_seed", str(args.random_seed)],
        check=True,
    )
    out_csv = os.path.join(work, f"generated-{shot}shot.csv")
    gen_args = [
        sys.executable, os.path.join(SCRIPTS, "generate_narration_texts.py"),
        "--model", args.model, "--dtype", args.dtype,
        "--eval_frames_dir", args.eval_frames_dir,
        *(["--eval_annotation_file", args.eval_annotation_file]
          if args.eval_annotation_file else []),
        "--in_context_query_map_file", f"{prefix}-{shot}-shot.jsonl",
        "--in_context_example_frames_dir", args.in_context_frames_dir,
        *(["--in_context_example_annotation_file", args.in_context_annotation_file]
          if args.in_context_annotation_file else []),
        "--batch_size", str(args.batch_size),
        "--random_seed", str(args.random_seed),
        "--output_csv", out_csv,
    ]
    if args.num_eval_datapoints:
        gen_args += ["--num_eval_datapoints", str(args.num_eval_datapoints)]
    subprocess.run(gen_args, check=True)
    return out_csv


def score_csv(args, path: str) -> dict:
    from eilev_tpu.eval.metrics import generation_metric_suite

    preds, refs = [], []
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            preds.append(row["generated"])
            refs.append(row["ground_truth"])
    return generation_metric_suite(
        preds, refs,
        bert_score_model=args.bert_score_model,
        sts_biencoder_model=args.sts_biencoder_model,
    )


def main() -> None:
    args = parse_args()
    from eilev_tpu.eval.published import TABLES

    published = TABLES[args.published_table]

    csvs: dict[int, str] = {}
    work = args.work_dir or tempfile.mkdtemp(prefix="verify-quality-")
    os.makedirs(work, exist_ok=True)
    if args.generated_csv:
        for pair in args.generated_csv:
            shot, path = pair.split("=", 1)
            csvs[int(shot)] = path
    else:
        required = ("model", "eval_frames_dir", "in_context_frames_dir")
        missing = [k for k in required if getattr(args, k) is None]
        if missing:
            raise SystemExit(f"full run needs --{', --'.join(missing)} (or use --generated_csv)")
        for shot in args.num_shots:
            csvs[shot] = run_pipeline(args, shot, work)

    results: dict[str, dict] = {}
    failures = []
    for shot, path in sorted(csvs.items()):
        metrics = score_csv(args, path)
        results[str(shot)] = metrics
        expect = published.get(shot, {})
        for name, pub in expect.items():
            if name not in metrics:
                print(f"[skip] {shot}-shot {name}: published {pub:.4f}, not computed "
                      "(pass the local encoder checkpoint to enable)")
                continue
            got = metrics[name]
            ok = abs(got - pub) <= args.tolerance
            status = "PASS" if ok else "FAIL"
            print(f"[{status}] {shot}-shot {name}: got {got:.4f}, published {pub:.4f} "
                  f"(tol ±{args.tolerance})")
            if not ok:
                failures.append((shot, name, got, pub))

    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump({"results": results, "failures": failures,
                       "tolerance": args.tolerance, "table": args.published_table}, f)
    if failures:
        print(f"quality parity FAILED: {len(failures)} metric(s) outside ±{args.tolerance}")
        raise SystemExit(1)
    print("quality parity PASSED")


if __name__ == "__main__":
    main()
