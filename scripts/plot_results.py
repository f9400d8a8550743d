#!/usr/bin/env python
"""Plot quality metrics vs shot count (the analysis-figure role).

Role-parity target: /root/reference/figures/icl_eval_figures.ipynb - metric
curves over the shot axis [0, 1, 2, 4, 8, 12, 16], optionally against the
reference's published EILeV numbers (README/BASELINE of this repo) for a
side-by-side.

Input: one JSON per shot count, as written by scripts/generation_eval.py
(--output_json) or scripts/icl_eval.py, supplied as SHOT=PATH pairs:

  python scripts/plot_results.py --metric rougeL \\
    0=eval-0shot.json 4=eval-4shot.json 16=eval-16shot.json \\
    --with_published --out rougeL_vs_shots.png
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import argparse
import json

# Published Ego4D held-out numbers for EILeV blip2-opt-2.7b (reference
# figures/icl_eval_figures.ipynb cell 3; shared with scripts/verify_quality.py)
from eilev_tpu.eval.published import EGO4D_OPT_2_7B as _PUB

PUBLISHED = {
    metric: {shot: vals[metric] for shot, vals in _PUB.items() if metric in vals}
    for metric in ("rougeL", "bleu", "sts_biencoder", "bertscore_f1")
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("results", nargs="+", help="SHOT=PATH pairs of result JSONs")
    p.add_argument("--metric", default="rougeL")
    p.add_argument("--with_published", action="store_true",
                   help="overlay the reference's published EILeV OPT-2.7B curve")
    p.add_argument("--title", default=None)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    shots, values = [], []
    for pair in args.results:
        shot, path = pair.split("=", 1)
        with open(path) as f:
            data = json.load(f)
        if args.metric not in data:
            raise SystemExit(f"{path} has no metric {args.metric!r}; keys: {list(data)}")
        shots.append(int(shot))
        values.append(float(data[args.metric]))
    order = sorted(range(len(shots)), key=lambda i: shots[i])
    shots = [shots[i] for i in order]
    values = [values[i] for i in order]

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(shots, values, marker="o", label="this framework")
    if args.with_published and args.metric in PUBLISHED:
        pub = sorted(PUBLISHED[args.metric].items())
        ax.plot(
            [s for s, _ in pub],
            [v for _, v in pub],
            marker="s",
            linestyle="--",
            label="EILeV OPT-2.7B (published)",
        )
    ax.set_xlabel("number of in-context examples (shots)")
    ax.set_ylabel(args.metric)
    ax.set_title(args.title or f"{args.metric} vs shots")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
