#!/usr/bin/env python
"""Verb/noun in-context-learning classification eval on Ego4D fho.

CLI-parity target: /root/reference/scripts/general/icl_eval.py - two-stage
classification ("...Answer: The camera wearer" -> verb, then
"...The camera wearer {verb}" -> noun) by mean log-likelihood over the class
prompt sets, macro F1 against the fho-lta taxonomy.

Class prompt CSVs use the reference schema ('prompt,structured_verb' /
'prompt,structured_noun' - scripts/ego4d/eval-data/*.csv in the reference).
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

import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True, help="HF save_pretrained dir")
    p.add_argument("--processor", default=None, help="tokenizer dir (default: --model)")
    p.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--fho_lta_taxonomy", required=True)
    p.add_argument("--fho_main", required=True)
    eval_data = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "ego4d", "eval-data")
    p.add_argument(
        "--structured_verb_prompt",
        default=_os.path.join(eval_data, "structured_verb_prompt.csv"),
        help="prompt->verb-class CSV (default: the vendored 188-row map, "
        "same rows as the reference's scripts/ego4d/eval-data)",
    )
    p.add_argument(
        "--structured_noun_prompt",
        default=_os.path.join(eval_data, "structured_noun_prompt.csv"),
        help="prompt->noun-class CSV (default: the vendored 793-row map)",
    )
    p.add_argument("--train_narrated_actions_dir", required=True)
    p.add_argument("--eval_narrated_actions_dir", required=True)
    p.add_argument("--num_shot", required=True, type=int)
    p.add_argument("--num_eval_datapoints", default=0, type=int)
    p.add_argument("--random-seed", type=int, default=42)
    p.add_argument("--class_batch_size", type=int, default=None)
    p.add_argument("--vision_cache", type=int, default=0,
                   help="LRU video-feature cache capacity (videos); encodes "
                        "each distinct video once across the verb+noun stages "
                        "and across datapoints (0 = off)")
    p.add_argument("--model_parallel", type=int, default=0,
                   help="shard the model weights over N devices (tensor"
                   " parallel); 0/1 = replicated")
    p.add_argument("--eval_batch_size", type=int, default=4,
                   help="datapoints classified per device program (TPU batching)")
    p.add_argument("--log_verb_preds", action="store_true")
    p.add_argument("--log_noun_preds", action="store_true")
    p.add_argument("--wandb_project", default=None)
    p.add_argument("--output_json", default=None)
    p.add_argument("--fast_gelu", action="store_true",
                   help="tanh gelu serving mode in the ViT (98.9%% bf16-"
                   "faithful, tower 66->74%% MFU; NOT bit-parity)")
    p.add_argument("--int8_lm", action="store_true",
                   help="weight-only int8 LM serving path (classification "
                   "scoring reads int8 weights; NOT bit-parity)")
    p.add_argument("--int8_kv", action="store_true",
                   help="int8 KV prompt cache; score_with_prefix dequantizes "
                   "on the read side (halves the shared-prompt cache HBM)")
    p.add_argument("--int8_vision", action="store_true",
                   help="W8A8 vision tower on the int8 MXU path")
    p.add_argument("--int8_qformer", action="store_true",
                   help="W8A8 Q-Former GEMMs on the int8 MXU path")
    p.add_argument("--w8a8_prefill", action="store_true",
                   help="with --int8_lm: LM prefill matmuls W8A8 on the int8 MXU")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    from eilev_tpu.data.frame import FrameDataset
    from eilev_tpu.eval import (
        IclEvaluator,
        add_and_filter_verb_noun,
        load_narrated_action_verb_noun,
        load_prompt_map,
    )
    from eilev_tpu.models.auto import load_model, load_tokenizer
    from eilev_tpu.utils import WandbLogger

    if args.fast_gelu:
        from eilev_tpu.ops.gelu import set_gelu_impl

        set_gelu_impl("fast")
    model, variables, config = load_model(
        args.model, dtype=dtype, int8_lm=args.int8_lm, int8_kv=args.int8_kv,
        int8_vision=args.int8_vision, int8_qformer=args.int8_qformer,
        w8a8_prefill=args.w8a8_prefill,
    )
    if args.model_parallel and args.model_parallel > 1:
        import jax

        from eilev_tpu.ops.attention import set_default_attention_impl
        from eilev_tpu.parallel import make_mesh, shard_variables_for_inference

        mesh = make_mesh(
            data=jax.device_count() // args.model_parallel, model=args.model_parallel
        )
        variables = shard_variables_for_inference(variables, mesh)
        # Pallas kernels are single-device programs; the XLA path shards cleanly.
        set_default_attention_impl("xla")
    tokenizer = load_tokenizer(args.processor or args.model)

    with open(args.fho_lta_taxonomy) as f:
        taxonomy = json.load(f)

    verb_noun = load_narrated_action_verb_noun(args.fho_main)
    # with --vision_cache, datasets return metadata only and the feature
    # cache PNG-decodes just its misses (lazy loader below)
    lazy = bool(args.vision_cache)
    train_dataset = add_and_filter_verb_noun(
        verb_noun,
        FrameDataset(args.train_narrated_actions_dir, return_frames=not lazy),
        0,
    )
    eval_dataset = add_and_filter_verb_noun(
        verb_noun,
        FrameDataset(args.eval_narrated_actions_dir, return_frames=not lazy),
        args.num_eval_datapoints,
    )
    frame_loader = None
    if lazy:
        _train_raw = FrameDataset(args.train_narrated_actions_dir)
        _eval_raw = FrameDataset(args.eval_narrated_actions_dir)

        def frame_loader(key):
            ds = _train_raw if key in _train_raw.dict_data else _eval_raw
            return ds[key]["video"]

    verb_prompts = load_prompt_map(args.structured_verb_prompt, "structured_verb")
    noun_prompts = load_prompt_map(args.structured_noun_prompt, "structured_noun")
    assert set(taxonomy["verbs"]) == set(verb_prompts.values())
    assert set(taxonomy["nouns"]) == set(noun_prompts.values())

    evaluator = IclEvaluator(
        model,
        variables,
        tokenizer,
        verb_prompts=verb_prompts,
        noun_prompts=noun_prompts,
        verbs=taxonomy["verbs"],
        nouns=taxonomy["nouns"],
        num_shot=args.num_shot,
        class_batch_size=args.class_batch_size,
        rng=random.Random(args.random_seed),
        dtype=dtype,
        vision_cache=args.vision_cache or None,
        frame_loader=frame_loader,
    )
    result = evaluator.evaluate(
        eval_dataset, train_dataset, progress=True, batch_size=args.eval_batch_size
    )

    print(f"Verb F1: {result.verb_f1}")
    print(f"Noun F1: {result.noun_f1}")
    logger = WandbLogger(project=args.wandb_project, enabled=args.wandb_project is not None)
    logger(0, {"verb_f1": result.verb_f1, "noun_f1": result.noun_f1})
    if args.log_verb_preds and result.verb_predictions:
        cols = list(result.verb_predictions[0])
        logger.log_table("verb_pred_table", cols, [[r[c] for c in cols] for r in result.verb_predictions])
    if args.log_noun_preds and result.noun_predictions:
        cols = list(result.noun_predictions[0])
        logger.log_table("noun_pred_table", cols, [[r[c] for c in cols] for r in result.noun_predictions])
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(
                {
                    "verb_f1": result.verb_f1,
                    "noun_f1": result.noun_f1,
                    "verb_predictions": result.verb_predictions,
                    "noun_predictions": result.noun_predictions,
                },
                f,
            )


if __name__ == "__main__":
    main()
