"""EILeV-TPU: a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
yukw777/EILEV - VideoBLIP models, interleaved video-text in-context learning,
training, generation, and evaluation."""

from . import configs

__version__ = "0.1.0"

__all__ = ["configs", "__version__"]
