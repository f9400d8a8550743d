"""Generation configuration (frozen/hashable -> usable as a jit static arg)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class GenerationConfig:
    """Decoding knobs, mirroring the subset of HF ``GenerationConfig`` the
    reference exercises (greedy, sampling with temperature/top-k/top-p, beam
    search with length_penalty - see reference
    ``samples/eilev_generate_action_narration.py:60-75`` and
    ``tests/model/test_model_v2.py:189-295``)."""

    max_new_tokens: int = 32
    num_beams: int = 1
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 50
    top_p: float = 1.0
    length_penalty: float = 1.0
    early_stopping: bool = False
    # eos may be a tuple (HF allows a list; the EILeV demo uses OPT newline 50118
    # as eos - reference demo/eilev_demo.py:61-65)
    eos_token_id: Optional[tuple[int, ...]] = None
    pad_token_id: int = 1

    def with_eos(self, eos) -> "GenerationConfig":
        import dataclasses

        if eos is None:
            return self
        if isinstance(eos, int):
            eos = (eos,)
        return dataclasses.replace(self, eos_token_id=tuple(eos))
