from .classify import classify
from .config import GenerationConfig, generation_config_from_json
from .decoding import generate, generate_stream
from .speculative import (
    build_lookup_corpus,
    make_self_draft,
    prompt_lookup_greedy_decode,
    speculative_greedy_decode,
)

__all__ = [
    "GenerationConfig",
    "generation_config_from_json",
    "classify",
    "generate",
    "generate_stream",
    "build_lookup_corpus",
    "make_self_draft",
    "prompt_lookup_greedy_decode",
    "speculative_greedy_decode",
]
