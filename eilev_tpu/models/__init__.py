from .opt import OPTForCausalLM, init_cache, opt_position_ids
from .qformer import QFormerModel
from .t5 import T5ForConditionalGeneration
from .video_blip import VideoBlipForConditionalGeneration, scatter_video_features
from .vision import VideoVisionModel, VisionModel

__all__ = [
    "OPTForCausalLM",
    "QFormerModel",
    "T5ForConditionalGeneration",
    "VideoBlipForConditionalGeneration",
    "VideoVisionModel",
    "VisionModel",
    "init_cache",
    "opt_position_ids",
    "scatter_video_features",
]
