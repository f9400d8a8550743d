"""Golden-layout tests for the prompt builders - the spec of the data contract
(reference tests/data/test_utils.py:57-846, rebuilt on a deterministic mock)."""

import numpy as np

from eilev_tpu.data.prompts import (
    IGNORE_INDEX,
    generate_input_ids_and_labels,
    generate_input_ids_and_labels_from_interleaved,
)

from .mock_tokenizer import MockTokenizer


def test_v1_decoder_only():
    tok = MockTokenizer()
    out = generate_input_ids_and_labels(tok, "Question: what? Answer:", "opens drawer", True)
    # prompt: [bos, Question:, what?, Answer:]; text: [opens, drawer, eos]
    q, w, a = tok.vocab["Question:"], tok.vocab["what?"], tok.vocab["Answer:"]
    o, d = tok.vocab["opens"], tok.vocab["drawer"]
    np.testing.assert_array_equal(out["input_ids"], [0, q, w, a, o, d, 2])
    np.testing.assert_array_equal(out["labels"], [-100, -100, -100, -100, o, d, 2])


def test_v1_seq2seq():
    tok = MockTokenizer(opt_style=False)
    out = generate_input_ids_and_labels(tok, "prompt words", "target text", False)
    p, w = tok.vocab["prompt"], tok.vocab["words"]
    t, x = tok.vocab["target"], tok.vocab["text"]
    np.testing.assert_array_equal(out["input_ids"], [p, w])
    np.testing.assert_array_equal(out["labels"], [t, x])


def test_interleaved_decoder_only_layout():
    """The core EILeV contract (reference data/utils.py:143-198): per video
    num_query_tokens pads + newline with video_input_mask 1 over the pads, bos
    first, newline between prompts, target = ' '+text+'\\n'+eos as labels."""
    tok = MockTokenizer()
    nl = tok("\n", add_special_tokens=False)["input_ids"][0]
    q = 3
    out = generate_input_ids_and_labels_from_interleaved(
        tok,
        prompts=[("What is happening?", 2), ("And now?", 1)],
        text="a narration",
        num_query_tokens=q,
        decoder_only_lm=True,
    )
    wt, ii, hp = tok.vocab["What"], tok.vocab["is"], tok.vocab["happening?"]
    an, nw = tok.vocab["And"], tok.vocab["now?"]
    a, nar = tok.vocab["a"], tok.vocab["narration"]

    expected_ids = (
        [0]                                   # bos
        + [1, 1, 1, nl] + [1, 1, 1, nl]       # 2 videos for prompt 0
        + [wt, ii, hp, nl]                    # prompt 0 + newline separator
        + [1, 1, 1, nl]                       # 1 video for prompt 1
        + [an, nw]                            # prompt 1 (last -> no newline)
        + [a, nar, nl, 2]                     # " text" + "\n" + eos
    )
    np.testing.assert_array_equal(out["input_ids"], expected_ids)

    expected_vim = (
        [0] + [1, 1, 1, 0] * 2 + [0] * 4 + [1, 1, 1, 0] + [0, 0] + [0] * 4
    )
    np.testing.assert_array_equal(out["video_input_mask"], expected_vim)

    expected_labels = [IGNORE_INDEX] * (len(expected_ids) - 4) + [a, nar, nl, 2]
    np.testing.assert_array_equal(out["labels"], expected_labels)

    assert len(out["input_ids"]) == len(out["labels"]) == len(out["video_input_mask"])


def test_interleaved_decoder_only_no_text():
    """Generation-time prompts have no target text and no trailing eos."""
    tok = MockTokenizer()
    out = generate_input_ids_and_labels_from_interleaved(
        tok, prompts=[("Describe.", 1)], text=None, num_query_tokens=2, decoder_only_lm=True
    )
    nl = tok.vocab["\n"]
    d = tok.vocab["Describe."]
    np.testing.assert_array_equal(out["input_ids"], [0, 1, 1, nl, d])
    np.testing.assert_array_equal(out["video_input_mask"], [0, 1, 1, 0, 0])
    assert (out["labels"] == IGNORE_INDEX).all()


def test_interleaved_seq2seq_layout():
    """Seq2seq (reference data/utils.py:199-217): no bos, eos appended to the LAST
    prompt, labels = tokenize(text) with tokenizer-provided specials."""
    tok = MockTokenizer(opt_style=False)
    out = generate_input_ids_and_labels_from_interleaved(
        tok,
        prompts=[("first prompt", 1), ("second", 1)],
        text="the answer",
        num_query_tokens=2,
        decoder_only_lm=False,
    )
    nl = tok.vocab["\n"]
    f, p = tok.vocab["first"], tok.vocab["prompt"]
    s = tok.vocab["second"]
    t, a = tok.vocab["the"], tok.vocab["answer"]
    np.testing.assert_array_equal(
        out["input_ids"], [1, 1, nl, f, p, nl, 1, 1, nl, s, 2]
    )
    np.testing.assert_array_equal(
        out["video_input_mask"], [1, 1, 0, 0, 0, 0, 1, 1, 0, 0, 0]
    )
    np.testing.assert_array_equal(out["labels"], [t, a])
