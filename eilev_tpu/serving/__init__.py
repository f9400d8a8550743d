"""TPU-native serving layer: continuous batching over fixed-shape slots."""

from .engine import Completion, ContinuousBatchingEngine, Request

__all__ = ["Completion", "ContinuousBatchingEngine", "Request"]
