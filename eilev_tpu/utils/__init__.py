from .logging import WandbLogger, maybe_wandb
from .meters import StepTimer

__all__ = ["StepTimer", "WandbLogger", "maybe_wandb"]
