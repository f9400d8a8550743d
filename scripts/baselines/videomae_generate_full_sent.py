#!/usr/bin/env python
"""Sentence-ify the VideoMAE baseline's verb/noun predictions with a local LM.

CLI-parity target: /root/reference/scripts/baselines/videomae/videomae_generate_full_sent.py
(Llama-2 there). Reads videomae_predict.py's CSV, writes a 'generated' column so
the output feeds generation_eval.py directly. Predicted classes are reduced to
their head word (split on '_') like the reference.
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

PROMPT_TEMPLATE = """Use the verb and noun to generate a sentence using "the camera wearer" as the subject.

Verb: cut
Noun: plant
Generated: The camera wearer cuts the plant.

Verb: repair
Noun: car
Generated: The camera wearer repairs the car.

Verb: move
Noun: tablet
Generated: The camera wearer moves the tablet.

Verb: %s
Noun: %s
Generated:"""


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True, help="local decoder-only LM dir")
    p.add_argument("--int8_lm", action="store_true",
                   help="weight-only int8 LM serving (ops/quantization.py)")
    p.add_argument("--predictions_csv", required=True, help="from videomae_predict.py")
    p.add_argument("--output_csv", required=True)
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args()

    from eilev_tpu.data.text import generate_chunks
    from eilev_tpu.generation import GenerationConfig
    from eilev_tpu.generation.text_lm import TextLM

    lm = TextLM(args.model, int8=args.int8_lm)
    newline_id = lm.tokenizer("\n", add_special_tokens=False)["input_ids"][0]
    gen_cfg = GenerationConfig(
        max_new_tokens=64, eos_token_id=(newline_id,), pad_token_id=lm.tokenizer.pad_token_id
    )

    with open(args.predictions_csv, newline="") as f:
        rows = list(csv.DictReader(f))

    fields = list(rows[0]) + ["generated", "ground_truth"]
    with open(args.output_csv, "w", newline="") as f:
        writer = csv.DictWriter(f, fields)
        writer.writeheader()
        for batch in generate_chunks(rows, args.batch_size):
            prompts = [
                PROMPT_TEMPLATE
                % (
                    (r["predicted_verb"] or "do").split("_", 1)[0],
                    (r["predicted_noun"] or "thing").split("_", 1)[0],
                )
                for r in batch
            ]
            texts = lm.generate(prompts, gen_cfg)
            for row, text in zip(batch, texts):
                row["generated"] = text.strip().split(".", maxsplit=1)[0] + "."
                row["ground_truth"] = row["ground_truth_narration_text"]
            writer.writerows(batch)
    print(f"wrote {len(rows)} rows to {args.output_csv}")


if __name__ == "__main__":
    main()
