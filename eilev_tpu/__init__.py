"""EILeV-TPU: a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
yukw777/EILEV - VideoBLIP models, interleaved video-text in-context learning,
training, generation, and evaluation."""

from . import configs
from .utils.compile_cache import maybe_enable_compilation_cache as _maybe_cache

# opt-in persistent XLA compilation cache (EILEV_COMPILATION_CACHE=<dir>):
# enabled at import so every CLI/demo/sample and library user gets warm
# restarts without per-entry-point wiring; no-op when the env var is unset
_maybe_cache()

__version__ = "0.1.0"

__all__ = ["configs", "__version__"]
