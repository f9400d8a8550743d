from .compile_cache import enable_compilation_cache, maybe_enable_compilation_cache
from .logging import WandbLogger, maybe_wandb
from .meters import StepTimer

__all__ = [
    "StepTimer",
    "WandbLogger",
    "enable_compilation_cache",
    "maybe_enable_compilation_cache",
    "maybe_wandb",
]
