from .classify import classify
from .config import GenerationConfig, generation_config_from_json
from .decoding import generate, generate_stream
from .speculative import make_self_draft, speculative_greedy_decode

__all__ = [
    "GenerationConfig",
    "generation_config_from_json",
    "classify",
    "generate",
    "generate_stream",
    "make_self_draft",
    "speculative_greedy_decode",
]
