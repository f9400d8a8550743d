#!/usr/bin/env python
"""Majority-class baseline: predict the majority ROOT verb / dobj noun of the
in-context example narrations.

CLI-parity target: /root/reference/scripts/baselines/majority/majority_predict.py
(spaCy dependency parse of the cleaned narrations; most common ROOT lemma as the
verb, most common dobj child lemma as the noun). Requires a local spaCy model
(en_core_web_sm); this environment cannot download one, so the script raises a
clear error without it.
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import csv
from collections import Counter


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--eval_frames_dir", required=True)
    p.add_argument("--eval_annotation_file")
    p.add_argument("--in_context_query_map_file", required=True)
    p.add_argument("--in_context_example_frames_dir", required=True)
    p.add_argument("--in_context_example_annotation_file")
    p.add_argument("--print_predictions", action="store_true")
    p.add_argument("--num_eval_datapoints", default=None, type=int)
    p.add_argument("--spacy_model", default="en_core_web_sm", help="name or local path")
    p.add_argument("--output_csv", required=True)
    args = p.parse_args()

    try:
        import spacy  # type: ignore

        nlp = spacy.load(args.spacy_model)
    except Exception as e:
        raise SystemExit(
            f"spaCy model unavailable ({e}). Install spacy and a local "
            "en_core_web_sm (no network in this environment)."
        )

    from eilev_tpu.data.frame import FrameInterleavedPresampledDataset
    from eilev_tpu.data.text import clean_narration_text

    dataset = FrameInterleavedPresampledDataset(
        args.eval_frames_dir,
        args.in_context_query_map_file,
        args.in_context_example_frames_dir,
        annotation_file=args.eval_annotation_file,
        in_context_example_annotation_file=args.in_context_example_annotation_file,
        return_frames=False,
    )

    rows = []
    n = len(dataset) if args.num_eval_datapoints is None else min(args.num_eval_datapoints, len(dataset))
    for i in range(n):
        datapoint = dataset[i]
        examples, query = datapoint["items"][:-1], datapoint["items"][-1]
        narrations = [clean_narration_text(e["narration_text"]) for e in examples]
        verb_counter: Counter = Counter()
        noun_counter: Counter = Counter()
        for doc in nlp.pipe(narrations, disable=["ner"]):
            for token in doc:
                if token.dep_ == "ROOT":
                    verb_counter[token.lemma_] += 1
                    for child in token.children:
                        if child.dep_ == "dobj":
                            noun_counter[child.lemma_] += 1
        pred_verb = verb_counter.most_common(1)[0][0] if verb_counter else ""
        pred_noun = noun_counter.most_common(1)[0][0] if noun_counter else ""
        if args.print_predictions:
            print(f"verb: {pred_verb} vs {query['structured_verb']}; "
                  f"noun: {pred_noun} vs {query['structured_noun']}")
        rows.append(
            {
                "frame_path": query["frame_path"],
                "video_uid": query["video_uid"],
                "clip_index": query["clip_index"],
                "predicted_verb": pred_verb,
                "ground_truth_structured_verb": query["structured_verb"],
                "predicted_noun": pred_noun,
                "ground_truth_structured_noun": query["structured_noun"],
                "ground_truth_narration_text": query["narration_text"],
            }
        )

    with open(args.output_csv, "w", newline="") as f:
        w = csv.DictWriter(f, list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} predictions to {args.output_csv}")


if __name__ == "__main__":
    main()
