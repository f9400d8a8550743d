#!/usr/bin/env python
"""Save mean-pooled vision-tower embeddings per clip (for t-SNE analysis).

CLI-parity target: /root/reference/scripts/general/get_vision_model_embs.py -
runs the video vision tower, mean-pools the per-frame pooler outputs over time,
and writes one embeddings array + frame_path index.
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

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--annotation_file", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_subsample_frames", type=int, default=8)
    p.add_argument("--output_prefix", required=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from eilev_tpu.data.frame import FrameDataset
    from eilev_tpu.data.text import generate_chunks
    from eilev_tpu.models.auto import load_model
    from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration as VB
    from eilev_tpu.ops.preprocess import process_videos

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model, variables, config = load_model(args.model, dtype=dtype)
    dataset = FrameDataset(args.frames_dir, annotation_file=args.annotation_file)

    @jax.jit
    def embed(pixel):
        _, pooled = model.apply(variables, pixel, method=VB.vision_forward)
        return pooled.mean(axis=1)  # (V, T, D) -> (V, D): mean over time

    img = config.vision_config.image_size
    embs, paths = [], []
    for chunk in generate_chunks(list(range(len(dataset))), args.batch_size):
        items = [dataset[i] for i in chunk]
        videos = np.stack([it["video"] for it in items])
        pixel = process_videos(
            jnp.asarray(videos), num_frames=args.num_subsample_frames,
            height=img, width=img, dtype=dtype,
        )
        embs.append(np.asarray(embed(pixel), np.float32))
        paths.extend(it["frame_path"] for it in items)
        print(f"embedded {len(paths)}/{len(dataset)}", flush=True)

    np.save(args.output_prefix + "_embs.npy", np.concatenate(embs))
    with open(args.output_prefix + "_index.json", "w") as f:
        json.dump(paths, f)
    print(f"wrote {len(paths)} embeddings to {args.output_prefix}_embs.npy")


if __name__ == "__main__":
    main()
