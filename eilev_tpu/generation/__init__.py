from .classify import classify
from .config import GenerationConfig
from .decoding import generate

__all__ = ["GenerationConfig", "classify", "generate"]
