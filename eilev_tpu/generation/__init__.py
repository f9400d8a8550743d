from .classify import classify
from .config import GenerationConfig
from .decoding import generate, generate_stream

__all__ = ["GenerationConfig", "classify", "generate", "generate_stream"]
