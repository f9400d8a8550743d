"""Collator tests (reference tests/data/test_utils.py:848-862 + padding rules)."""

import numpy as np

from eilev_tpu.data.collate import (
    DataCollatorForInterleavedVideoSeq2Seq,
    DataCollatorForVideoSeq2Seq,
)


def _feat(ids, labels=None, vim=None, pixels=None):
    f = {"input_ids": np.asarray(ids)}
    if labels is not None:
        f["labels"] = np.asarray(labels)
    if vim is not None:
        f["video_input_mask"] = np.asarray(vim)
    if pixels is not None:
        f["pixel_values"] = pixels
    return f


def test_v1_collator_stacks_pixels_and_pads():
    c = DataCollatorForVideoSeq2Seq(pad_token_id=1)
    px = np.zeros((3, 2, 4, 4), np.float32)
    batch = c([
        _feat([5, 6, 7], labels=[-100, 6, 7], pixels=px),
        _feat([5, 6], labels=[-100, 6], pixels=px),
    ])
    assert batch["pixel_values"].shape == (2, 3, 2, 4, 4)
    np.testing.assert_array_equal(batch["input_ids"], [[5, 6, 7], [5, 6, 1]])
    np.testing.assert_array_equal(batch["attention_mask"], [[1, 1, 1], [1, 1, 0]])
    np.testing.assert_array_equal(batch["labels"], [[-100, 6, 7], [-100, 6, -100]])


def test_interleaved_collator_right_padding():
    c = DataCollatorForInterleavedVideoSeq2Seq(pad_token_id=1, padding_side="right")
    px1 = np.zeros((2, 3, 2, 4, 4), np.float32)  # 2 videos
    px2 = np.zeros((1, 3, 2, 4, 4), np.float32)  # 1 video
    batch = c([
        _feat([5, 6, 7, 8], vim=[0, 1, 1, 0], pixels=px1),
        _feat([5, 6], vim=[1, 0], pixels=px2),
    ])
    # pixel_values concatenated along the video axis (reference data/utils.py:37-41)
    assert batch["pixel_values"].shape == (3, 3, 2, 4, 4)
    np.testing.assert_array_equal(batch["video_input_mask"], [[0, 1, 1, 0], [1, 0, 0, 0]])


def test_interleaved_collator_left_padding():
    c = DataCollatorForInterleavedVideoSeq2Seq(pad_token_id=1, padding_side="left")
    batch = c([
        _feat([5, 6, 7, 8], vim=[0, 1, 1, 0]),
        _feat([5, 6], vim=[1, 0]),
    ])
    np.testing.assert_array_equal(batch["input_ids"], [[5, 6, 7, 8], [1, 1, 5, 6]])
    np.testing.assert_array_equal(batch["attention_mask"], [[1, 1, 1, 1], [0, 0, 1, 1]])
    np.testing.assert_array_equal(batch["video_input_mask"], [[0, 1, 1, 0], [0, 0, 1, 0]])


def test_pad_to_multiple_of():
    c = DataCollatorForInterleavedVideoSeq2Seq(pad_token_id=1, pad_to_multiple_of=8)
    batch = c([_feat([5, 6, 7], vim=[1, 1, 0], labels=[-100, -100, 7])])
    assert batch["input_ids"].shape == (1, 8)
    assert batch["video_input_mask"].shape == (1, 8)
    assert batch["labels"].shape == (1, 8)
    assert (batch["labels"][0, 3:] == -100).all()
