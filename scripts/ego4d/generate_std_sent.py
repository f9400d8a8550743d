#!/usr/bin/env python
"""Few-shot generation of standardized sentences from verb/noun classes.

CLI-parity target: /root/reference/scripts/ego4d/generate_std_sent.py (which uses
Llama-2-chat). Here --model is any local decoder-only checkpoint this framework
runs (OPT family); the few-shot prompt and post-processing (first sentence up to
'.') match the reference.
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
    p.add_argument("--annotation", required=True)
    p.add_argument("--annotation_with_std_sent", required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=64)
    args = p.parse_args()

    from eilev_tpu.data.text import generate_chunks
    from eilev_tpu.generation import GenerationConfig
    from eilev_tpu.generation.text_lm import TextLM

    lm = TextLM(args.model, int8=args.int8_lm)
    newline_id = lm.tokenizer("\n", add_special_tokens=False)["input_ids"][0]
    gen_cfg = GenerationConfig(
        max_new_tokens=args.max_new_tokens,
        eos_token_id=(newline_id,),
        pad_token_id=lm.tokenizer.pad_token_id,
    )

    rows = []
    with open(args.annotation, newline="") as f:
        for row in csv.DictReader(f):
            if row["structured_verb"] == "" or row["structured_noun"] == "":
                continue
            row["verb"] = row["structured_verb"].split("_", 1)[0]
            row["noun"] = row["structured_noun"].split("_", 1)[0]
            rows.append(row)

    # narration_text is replaced when present, appended otherwise
    fields = list(dict.fromkeys([k for k in rows[0] if k not in {"verb", "noun"}] + ["narration_text"]))
    with open(args.annotation_with_std_sent, "w", newline="") as f:
        writer = csv.DictWriter(f, fields)
        writer.writeheader()
        for batch in generate_chunks(rows, args.batch_size):
            prompts = [PROMPT_TEMPLATE % (r["verb"], r["noun"]) for r in batch]
            texts = lm.generate(prompts, gen_cfg)
            for row, text in zip(batch, texts):
                narration = text.strip().split(".", maxsplit=1)[0] + "."
                row["narration_text"] = narration
                del row["verb"], row["noun"]
            writer.writerows(batch)
    print(f"wrote {len(rows)} rows to {args.annotation_with_std_sent}")


if __name__ == "__main__":
    main()
