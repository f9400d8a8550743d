from .classify import classify
from .config import GenerationConfig
from .decoding import generate, generate_stream
from .speculative import make_self_draft, speculative_greedy_decode

__all__ = [
    "GenerationConfig",
    "classify",
    "generate",
    "generate_stream",
    "make_self_draft",
    "speculative_greedy_decode",
]
