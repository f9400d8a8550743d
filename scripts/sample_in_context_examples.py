#!/usr/bin/env python
"""Pre-sample in-context example -> query maps to JSONL.

CLI-parity target: /root/reference/scripts/general/sample_in_context_examples.py -
runs the verb/noun-bucket sampler with return_frames=False and writes
{"context": [frame_paths...], "query": frame_path} lines consumed by
FrameInterleavedPresampledDataset / generate_narration_texts.py.
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
import json
import random


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in_context_frames_dir", required=True)
    p.add_argument("--in_context_annotation_file")
    p.add_argument("--eval_frames_dir", required=True)
    p.add_argument("--eval_annotation_file")
    p.add_argument("--num_shot", required=True, type=int)
    p.add_argument("--output_prefix", required=True)
    p.add_argument("--verb_noun_ratio", required=True, type=float)
    p.add_argument("--random_seed", type=int, default=42)
    args = p.parse_args()

    from eilev_tpu.data.frame import FrameInterleavedDataset

    dataset = FrameInterleavedDataset(
        args.eval_frames_dir,
        annotation_file=args.eval_annotation_file,
        in_context_example_frames_dir=args.in_context_frames_dir,
        in_context_example_annotation_file=args.in_context_annotation_file,
        num_in_context_examples_per_sample=args.num_shot,
        verb_noun_ratio=args.verb_noun_ratio,
        return_frames=False,
        rng=random.Random(args.random_seed),
    )
    fname = f"{args.output_prefix}-{args.num_shot}-shot.jsonl"
    with open(fname, "w") as f:
        for i in range(len(dataset)):
            frame_paths = [item["frame_path"] for item in dataset[i]["items"]]
            f.write(json.dumps({"context": frame_paths[:-1], "query": frame_paths[-1]}) + "\n")
    print(f"wrote {len(dataset)} maps to {fname}")


if __name__ == "__main__":
    main()
