"""Generation configuration (frozen/hashable -> usable as a jit static arg)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class GenerationConfig:
    """Decoding knobs, mirroring the subset of HF ``GenerationConfig`` the
    reference exercises (greedy, sampling with temperature/top-k/top-p, beam
    search with length_penalty - see reference
    ``samples/eilev_generate_action_narration.py:60-75`` and
    ``tests/model/test_model_v2.py:189-295``). ``do_sample`` with
    ``num_beams > 1`` runs HF ``beam_sample`` semantics (warped multinomial
    candidate draw, expressed as Gumbel top-k in decoding._beam_engine)."""

    max_new_tokens: int = 32
    num_beams: int = 1
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 50
    top_p: float = 1.0
    length_penalty: float = 1.0
    early_stopping: bool = False
    # eos may be a tuple (HF allows a list; the EILeV demo uses OPT newline 50118
    # as eos - reference demo/eilev_demo.py:61-65)
    eos_token_id: Optional[tuple[int, ...]] = None
    pad_token_id: int = 1
    # HF logits-processor knobs (the reference CLI forwards arbitrary
    # GenerationConfig JSON to HF generate - reference
    # scripts/general/generate_narration_texts.py:203):
    # RepetitionPenaltyLogitsProcessor / NoRepeatNGramLogitsProcessor /
    # MinNewTokensLengthLogitsProcessor semantics, implemented fixed-shape in
    # generation/decoding.py:_process_scores.
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: int = 0
    min_new_tokens: int = 0
    # HF ``num_return_sequences``: >1 returns that many sequences per input row
    # (interleaved, like HF). Sampling tiles the KV cache after ONE prefill
    # (cheaper than HF's repeat_interleave-then-prefill); beam search returns
    # the top-n finished hypotheses (requires num_return_sequences <= num_beams,
    # the HF contract). Greedy requires 1, as in HF.
    num_return_sequences: int = 1

    @property
    def has_logits_processors(self) -> bool:
        return (
            self.repetition_penalty != 1.0
            or self.no_repeat_ngram_size > 0
            or self.min_new_tokens > 0
        )

    def with_eos(self, eos) -> "GenerationConfig":
        import dataclasses

        if eos is None:
            return self
        if isinstance(eos, int):
            eos = (eos,)
        return dataclasses.replace(self, eos_token_id=tuple(eos))


#: JSON keys accepted by :func:`generation_config_from_json`, mapped to
#: GenerationConfig fields (None = handled specially).
_SUPPORTED_JSON_KEYS = {
    "max_new_tokens": "max_new_tokens",
    "num_beams": "num_beams",
    "do_sample": "do_sample",
    "temperature": "temperature",
    "top_k": "top_k",
    "top_p": "top_p",
    "length_penalty": "length_penalty",
    "early_stopping": "early_stopping",
    "eos_token_id": None,
    "pad_token_id": "pad_token_id",
    "repetition_penalty": "repetition_penalty",
    "no_repeat_ngram_size": "no_repeat_ngram_size",
    "min_new_tokens": "min_new_tokens",
    "num_return_sequences": "num_return_sequences",
}

#: Keys silently accepted because our engines already implement their HF
#: default behavior unconditionally (passing the default is a no-op in HF too).
_IGNORED_JSON_KEYS = {"use_cache", "bos_token_id", "_from_model_config", "transformers_version"}


def generation_config_from_json(
    gen_json: dict,
    *,
    pad_token_id: int,
    default_max_new_tokens: int = 512,
) -> GenerationConfig:
    """Build a :class:`GenerationConfig` from an HF ``GenerationConfig``-style
    JSON dict (the reference CLI contract - its ``--generation_config`` flag is
    forwarded verbatim to HF ``generate``, reference
    ``scripts/general/generate_narration_texts.py:203``).

    Unknown or unsupported keys raise ``ValueError`` listing the supported set
    instead of dying as a bare ``TypeError`` downstream.
    """
    known_unsupported = {
        "penalty_alpha",
        "typical_p",
        "epsilon_cutoff",
        "eta_cutoff",
        "diversity_penalty",
        "num_beam_groups",
        "encoder_repetition_penalty",
        "bad_words_ids",
        "force_words_ids",
        "suppress_tokens",
        "begin_suppress_tokens",
        "forced_bos_token_id",
        "forced_eos_token_id",
        "exponential_decay_length_penalty",
        "max_length",
        "min_length",
        "guidance_scale",
        "low_memory",
        "constraints",
        "sequence_bias",
        "renormalize_logits",
        "remove_invalid_values",
        "max_time",
        "stop_strings",
    }
    kwargs: dict = {"pad_token_id": pad_token_id}
    eos = None
    for key, value in gen_json.items():
        if key in _IGNORED_JSON_KEYS:
            continue
        if key not in _SUPPORTED_JSON_KEYS:
            supported = ", ".join(sorted(_SUPPORTED_JSON_KEYS))
            hint = (
                "not implemented by the TPU decode engines"
                if key in known_unsupported
                else "not a recognized HF GenerationConfig key"
            )
            raise ValueError(
                f"generation_config key {key!r} is {hint}; supported keys: "
                f"{supported}"
            )
        if key == "eos_token_id":
            eos = value
        else:
            kwargs[_SUPPORTED_JSON_KEYS[key]] = value
    kwargs.setdefault("max_new_tokens", default_max_new_tokens)
    return GenerationConfig(**kwargs).with_eos(eos)
