"""Deterministic word-level mock tokenizer for golden prompt-builder tests
(same technique as reference tests/data/test_utils.py Mock-tokenizer tests; the
reference's real-tokenizer golden tests need Hub downloads, unavailable here)."""

from __future__ import annotations

import re


class MockTokenizer:
    """Word-level: ids assigned in order of first appearance, starting at 10.
    Special ids: bos=0, pad=1, eos=2. '\\n' is its own token.
    ``add_special_tokens=True`` prepends bos (OPT-style)."""

    bos_token_id = 0
    pad_token_id = 1
    eos_token_id = 2
    padding_side = "right"

    def __init__(self, opt_style: bool = True):
        self.vocab: dict[str, int] = {}
        self.opt_style = opt_style

    def _id(self, token: str) -> int:
        if token not in self.vocab:
            self.vocab[token] = 10 + len(self.vocab)
        return self.vocab[token]

    def __call__(self, text: str, add_special_tokens: bool = True, **kwargs):
        tokens = re.findall(r"\n|\S+", text)
        ids = [self._id(t) for t in tokens]
        if add_special_tokens and self.opt_style:
            ids = [self.bos_token_id] + ids
        return {"input_ids": ids}
