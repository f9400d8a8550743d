"""Build a tiny byte-level BPE tokenizer offline (OPT-style specials) for
integration tests - no Hub downloads available in this environment."""

from __future__ import annotations

from tokenizers import Tokenizer, decoders, models, pre_tokenizers, processors, trainers
from transformers import PreTrainedTokenizerFast

CORPUS = [
    "The camera wearer does a thing.",
    "The camera wearer opens a drawer.",
    "The camera wearer picks up a knife.",
    "The camera wearer cuts an onion in the kitchen.",
    "The camera wearer washes a plate in the sink.",
    "Question: What is the camera wearer doing? Answer:",
    "Q: What is the camera wearer doing? A:",
    "What is the camera wearer doing? An answer to the question is",
    "Given the video, answer the following question.",
    "action one two three four five six seven eight nine ten",
    "\n",
]


def build_tiny_tokenizer(save_dir: str, vocab_size: int = 384) -> PreTrainedTokenizerFast:
    """OPT-flavored tiny tokenizer: byte-level BPE, bos prepended by
    add_special_tokens, pad=1, bos=eos=0-style specials (ids: </s>=0, <pad>=1)."""
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["</s>", "<pad>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(CORPUS * 10, trainer)
    # OPT prepends bos when add_special_tokens=True
    tok.post_processor = processors.TemplateProcessing(
        single="</s> $A", pair="</s> $A </s> $B", special_tokens=[("</s>", 0)]
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="</s>", eos_token="</s>", pad_token="<pad>"
    )
    fast.save_pretrained(save_dir)
    return fast
