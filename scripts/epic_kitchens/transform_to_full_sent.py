#!/usr/bin/env python
"""Rewrite EPIC-KITCHENS phrase narrations into full camera-wearer sentences.

CLI-parity target: /root/reference/scripts/epic-kitchens/transform_to_full_sent.py
(Llama-2 there; any local decoder-only checkpoint this framework runs here).
Writes the original annotation CSV plus a full_sent_narration column.
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

PROMPT_TEMPLATE = """Rewrite the phrase as a full sentence using "the camera wearer" as the subject.

Phrase: open door
Sentence: The camera wearer opens the door.

Phrase: wash carrot
Sentence: The camera wearer washes the carrot.

Phrase: put down plate
Sentence: The camera wearer puts down the plate.

Phrase: %s
Sentence:"""


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True, help="local decoder-only LM dir")
    p.add_argument("--int8_lm", action="store_true",
                   help="weight-only int8 LM serving (ops/quantization.py)")
    p.add_argument("--annotation", required=True, help="EK annotation CSV with a 'narration' column")
    p.add_argument("--output", required=True)
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

    with open(args.annotation, newline="") as f:
        rows = list(csv.DictReader(f))

    fields = list(rows[0]) + ["full_sent_narration"]
    with open(args.output, "w", newline="") as f:
        writer = csv.DictWriter(f, fields)
        writer.writeheader()
        for batch in generate_chunks(rows, args.batch_size):
            prompts = [PROMPT_TEMPLATE % r["narration"] for r in batch]
            texts = lm.generate(prompts, gen_cfg)
            for row, text in zip(batch, texts):
                row["full_sent_narration"] = text.strip().split(".", maxsplit=1)[0] + "."
            writer.writerows(batch)
    print(f"wrote {len(rows)} rows to {args.output}")


if __name__ == "__main__":
    main()
