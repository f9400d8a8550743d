"""TPU-native serving layer: continuous batching over fixed-shape slots,
multi-turn chat sessions with incremental prefill."""

from .engine import Completion, ContinuousBatchingEngine, Request
from .feature_cache import VideoFeatureCache
from .session import ChatSession

__all__ = [
    "ChatSession",
    "Completion",
    "ContinuousBatchingEngine",
    "Request",
    "VideoFeatureCache",
]
