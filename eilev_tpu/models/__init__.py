from .llama import LlamaForCausalLM, convert_llama, llama_config_from_hf
from .opt import OPTForCausalLM, init_cache, opt_position_ids
from .qformer import QFormerModel
from .t5 import T5ForConditionalGeneration
from .video_blip import VideoBlipForConditionalGeneration, scatter_video_features
from .vision import VideoVisionModel, VisionModel

__all__ = [
    "LlamaForCausalLM",
    "OPTForCausalLM",
    "QFormerModel",
    "T5ForConditionalGeneration",
    "VideoBlipForConditionalGeneration",
    "VideoVisionModel",
    "VisionModel",
    "convert_llama",
    "init_cache",
    "llama_config_from_hf",
    "opt_position_ids",
    "scatter_video_features",
]
