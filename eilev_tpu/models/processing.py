"""Processor shim: the ``process()`` convenience API.

Parity target: /root/reference/eilev/model/utils.py:5-26 - one call that
prepares both modalities: flatten the (B, C, T, H, W) video over time, run the
Blip2 image pipeline (resize 224 bicubic -> rescale -> CLIP normalize),
restore the time axis, and tokenize optional text. Here the image math runs as
one fused jitted program on device (ops.preprocess.process_videos).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import VideoBlipConfig
from ..ops.preprocess import process_videos


@dataclass
class VideoBlipProcessor:
    """Bundles a tokenizer with the fused video pipeline.

    ``__call__(video=..., text=...)`` mirrors the reference's
    ``process(processor, video, text)``: returns a dict with ``pixel_values``
    (B, C, T, H, W) in ``dtype`` and, when text is given, ``input_ids`` /
    ``attention_mask`` (numpy).
    """

    tokenizer: Any
    image_size: int = 224
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, tokenizer, config: VideoBlipConfig, dtype=jnp.float32):
        return cls(tokenizer, image_size=config.vision_config.image_size, dtype=dtype)

    def __call__(
        self,
        video: Optional[jax.Array] = None,
        text: Optional[str | list[str]] = None,
        padding: bool = True,
    ) -> dict[str, Any]:
        out: dict[str, Any] = {}
        if video is not None:
            video = jnp.asarray(video)
            if video.ndim == 4:  # (C, T, H, W) -> add batch
                video = video[None]
            out["pixel_values"] = process_videos(
                video, height=self.image_size, width=self.image_size, dtype=self.dtype
            )
        if text is not None:
            texts = [text] if isinstance(text, str) else list(text)
            enc = [self.tokenizer(t)["input_ids"] for t in texts]
            longest = max(len(e) for e in enc)
            ids = np.full((len(enc), longest), self.tokenizer.pad_token_id, np.int64)
            mask = np.zeros((len(enc), longest), np.int64)
            for i, e in enumerate(enc):
                ids[i, : len(e)] = e
                mask[i, : len(e)] = 1
            out["input_ids"] = ids
            out["attention_mask"] = mask
        return out
