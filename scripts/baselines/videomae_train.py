#!/usr/bin/env python
"""Fine-tune a VideoMAE verb or noun classifier on extracted frames.

CLI-parity target: /root/reference/scripts/baselines/videomae/videomae_train.py -
FrameDataset filtered to labeled actions, label set = sorted union of train+val
classes, train transform = subsample -> rescale/normalize -> RandomShortSideScale
(256-320) -> RandomCrop -> HFlip, eval transform deterministic resize; macro F1.
Full fine-tune (all params trainable) with AdamW.
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
import json
import random


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_name_or_path", default=None,
                   help="local HF VideoMAE dir to initialize from (random init if omitted)")
    p.add_argument("--verb", action="store_true", help="train the verb classifier (else noun)")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--train_frames_dir", required=True)
    p.add_argument("--val_frames_dir", required=True)
    p.add_argument("--train_annotation_file", default=None)
    p.add_argument("--val_annotation_file", default=None)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--num_train_steps", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--eval_steps", type=int, default=200)
    p.add_argument("--logging_steps", type=int, default=20)
    p.add_argument("--seed", type=int, default=42)
    # tiny-config knobs for smoke tests
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_hidden_layers", type=int, default=12)
    p.add_argument("--num_attention_heads", type=int, default=12)
    return p.parse_args()


def main() -> None:
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from eilev_tpu.data.frame import FrameDataset
    from eilev_tpu.eval.metrics import MulticlassF1
    from eilev_tpu.models.videomae import (
        VideoMAEConfig,
        VideoMAEForVideoClassification,
        convert_videomae,
    )
    from eilev_tpu.ops import preprocess as pp

    def data_filter(item):
        return item["structured_verb"] not in {"", "[other]"} and item["structured_noun"] != ""

    train_data = FrameDataset(
        args.train_frames_dir, annotation_file=args.train_annotation_file, data_filter=data_filter
    )
    val_data = FrameDataset(
        args.val_frames_dir, annotation_file=args.val_annotation_file, data_filter=data_filter
    )
    label_key = "structured_verb" if args.verb else "structured_noun"
    labels = sorted(
        {d[label_key] for d in train_data.data} | {d[label_key] for d in val_data.data}
    )
    label2id = {l: i for i, l in enumerate(labels)}
    print(f"{len(labels)} classes for {label_key}")

    cfg = VideoMAEConfig(
        image_size=args.image_size,
        num_frames=args.num_frames,
        hidden_size=args.hidden_size,
        num_hidden_layers=args.num_hidden_layers,
        num_attention_heads=args.num_attention_heads,
        intermediate_size=args.hidden_size * 4,
        num_labels=len(labels),
    )
    model = VideoMAEForVideoClassification(cfg)
    rng = jax.random.PRNGKey(args.seed)
    dummy = jnp.zeros((1, 3, args.num_frames, args.image_size, args.image_size), jnp.float32)
    params = model.init(rng, dummy)["params"]
    if args.model_name_or_path:
        # initialize the backbone from a local HF checkpoint; the classifier head
        # stays freshly initialized (ignore_mismatched_sizes semantics)
        import glob

        from safetensors import safe_open

        tensors = {}
        for f in glob.glob(args.model_name_or_path + "/*.safetensors"):
            with safe_open(f, framework="np") as sf:
                for k in sf.keys():
                    tensors[k] = sf.get_tensor(k)
        loaded = convert_videomae(tensors, cfg)
        loaded["classifier"] = params["classifier"]
        params = loaded

    # VideoMAE uses ImageNet normalization stats
    imagenet_mean, imagenet_std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)

    def train_item(key, video_u8):
        x = pp.uniform_temporal_subsample(jnp.asarray(video_u8), args.num_frames)
        x = pp.normalize(pp.rescale(x), imagenet_mean, imagenet_std)
        k1, k2, k3 = jax.random.split(key, 3)
        x = pp.random_short_side_scale(k1, x, 256, 320)
        x = pp.random_crop(k2, x, args.image_size, args.image_size)
        x = pp.random_horizontal_flip(k3, x)
        return x

    def eval_item(video_u8):
        x = pp.uniform_temporal_subsample(jnp.asarray(video_u8), args.num_frames)
        x = pp.normalize(pp.rescale(x), imagenet_mean, imagenet_std)
        return pp.resize_video(x, args.image_size, args.image_size)

    tx = optax.adamw(
        optax.join_schedules(
            [
                optax.linear_schedule(0.0, args.learning_rate, args.warmup_steps),
                optax.linear_schedule(
                    args.learning_rate, 0.0, max(args.num_train_steps - args.warmup_steps, 1)
                ),
            ],
            [args.warmup_steps],
        ),
        weight_decay=0.05,
    )
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, pixel, label):
        def loss_fn(p):
            return model.apply({"params": p}, pixel, labels=label)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict_step(params, pixel):
        return model.apply({"params": params}, pixel)["logits"].argmax(-1)

    py_rng = random.Random(args.seed)
    key = jax.random.PRNGKey(args.seed)
    step = 0
    while step < args.num_train_steps:
        idx = [py_rng.randrange(len(train_data)) for _ in range(args.batch_size)]
        items = [train_data[i] for i in idx]
        key, *ks = jax.random.split(key, args.batch_size + 1)
        pixel = jnp.stack([train_item(k, it["video"]) for k, it in zip(ks, items)])
        label = jnp.asarray([label2id[it[label_key]] for it in items])
        params, opt_state, loss = train_step(params, opt_state, pixel, label)
        step += 1
        if step % args.logging_steps == 0:
            print(f"step {step}: loss {float(loss):.4f}", flush=True)
        if args.eval_steps and step % args.eval_steps == 0:
            f1 = MulticlassF1(len(labels))
            for i in range(0, len(val_data), args.batch_size):
                items = [val_data[j] for j in range(i, min(i + args.batch_size, len(val_data)))]
                pixel = jnp.stack([eval_item(it["video"]) for it in items])
                preds = np.asarray(predict_step(params, pixel))
                f1.update(preds, [label2id[it[label_key]] for it in items])
            print(f"step {step}: val macro F1 {f1.compute():.4f}", flush=True)

    import os

    os.makedirs(args.output_dir, exist_ok=True)
    import pickle

    with open(os.path.join(args.output_dir, "params.pkl"), "wb") as f:
        pickle.dump(jax.device_get(params), f)
    with open(os.path.join(args.output_dir, "labels.json"), "w") as f:
        json.dump({"labels": labels, "label_key": label_key, "config": cfg.__dict__}, f)
    print(f"saved classifier to {args.output_dir}")


if __name__ == "__main__":
    main()
