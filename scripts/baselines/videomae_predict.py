#!/usr/bin/env python
"""Paired verb+noun VideoMAE inference over a frame dataset.

CLI-parity target: /root/reference/scripts/baselines/videomae/videomae_predict.py
(VerbNounClassifier running both fine-tuned classifiers per clip, CSV of
predictions for the sentence-ifier + F1 summary).
"""

# allow running from a source checkout without installation
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))
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
import pickle


def _load_classifier(path):
    import jax.numpy as jnp

    from eilev_tpu.models.videomae import VideoMAEConfig, VideoMAEForVideoClassification

    with open(path + "/labels.json") as f:
        meta = json.load(f)
    cfg = VideoMAEConfig(**meta["config"])
    with open(path + "/params.pkl", "rb") as f:
        params = pickle.load(f)
    model = VideoMAEForVideoClassification(cfg)
    return model, params, meta["labels"], cfg


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--verb_classifier", required=True, help="videomae_train.py output dir")
    p.add_argument("--noun_classifier", required=True)
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--annotation_file", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_eval_datapoints", type=int, default=None)
    p.add_argument("--output_csv", required=True)
    p.add_argument("--print_predictions", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from eilev_tpu.data.frame import FrameDataset
    from eilev_tpu.data.text import generate_chunks
    from eilev_tpu.eval.metrics import MulticlassF1
    from eilev_tpu.ops import preprocess as pp

    verb_model, verb_params, verb_labels, vcfg = _load_classifier(args.verb_classifier)
    noun_model, noun_params, noun_labels, ncfg = _load_classifier(args.noun_classifier)

    def data_filter(item):
        return item["structured_verb"] not in {"", "[other]"} and item["structured_noun"] != ""

    dataset = FrameDataset(args.frames_dir, annotation_file=args.annotation_file, data_filter=data_filter)

    imagenet_mean, imagenet_std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)

    def preprocess(video_u8):
        x = pp.uniform_temporal_subsample(jnp.asarray(video_u8), vcfg.num_frames)
        x = pp.normalize(pp.rescale(x), imagenet_mean, imagenet_std)
        return pp.resize_video(x, vcfg.image_size, vcfg.image_size)

    @jax.jit
    def predict(vp, np_, pixel):
        v = verb_model.apply({"params": vp}, pixel)["logits"].argmax(-1)
        n = noun_model.apply({"params": np_}, pixel)["logits"].argmax(-1)
        return v, n

    verb_f1 = MulticlassF1(len(verb_labels))
    noun_f1 = MulticlassF1(len(noun_labels))
    verb_id = {l: i for i, l in enumerate(verb_labels)}
    noun_id = {l: i for i, l in enumerate(noun_labels)}

    n_total = len(dataset) if args.num_eval_datapoints is None else min(args.num_eval_datapoints, len(dataset))
    rows = []
    for chunk in generate_chunks(list(range(n_total)), args.batch_size):
        items = [dataset[i] for i in chunk]
        pixel = jnp.stack([preprocess(it["video"]) for it in items])
        v_pred, n_pred = predict(verb_params, noun_params, pixel)
        for it, vi, ni in zip(items, np.asarray(v_pred), np.asarray(n_pred)):
            pv, pn = verb_labels[vi], noun_labels[ni]
            if it["structured_verb"] in verb_id:
                verb_f1([int(vi)], [verb_id[it["structured_verb"]]])
            if it["structured_noun"] in noun_id:
                noun_f1([int(ni)], [noun_id[it["structured_noun"]]])
            if args.print_predictions:
                print(f"verb: {pv} vs {it['structured_verb']}; noun: {pn} vs {it['structured_noun']}")
            rows.append(
                {
                    "frame_path": it["frame_path"],
                    "video_uid": it["video_uid"],
                    "clip_index": it["clip_index"],
                    "predicted_verb": pv,
                    "ground_truth_structured_verb": it["structured_verb"],
                    "predicted_noun": pn,
                    "ground_truth_structured_noun": it["structured_noun"],
                    "ground_truth_narration_text": it["narration_text"],
                }
            )

    with open(args.output_csv, "w", newline="") as f:
        w = csv.DictWriter(f, list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"verb F1: {verb_f1.compute():.4f}  noun F1: {noun_f1.compute():.4f}")
    print(f"wrote {len(rows)} predictions to {args.output_csv}")


if __name__ == "__main__":
    main()
