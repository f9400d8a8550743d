"""Processor shim contract (reference eilev/model/utils.py:5-26 +
tests/model/test_model_utils.py reshape round-trip)."""

import sys

import numpy as np

sys.path.insert(0, "tests")

from eilev_tpu.models.processing import VideoBlipProcessor


class _Tok:
    pad_token_id = 1

    def __call__(self, text, **kw):
        return {"input_ids": [7] * len(text.split())}


def test_process_shapes_and_values():
    proc = VideoBlipProcessor(_Tok(), image_size=16)
    rng = np.random.default_rng(0)
    video = rng.integers(0, 256, size=(2, 3, 4, 16, 16)).astype(np.uint8)
    out = proc(video=video, text=["a b c", "d e"])
    assert out["pixel_values"].shape == (2, 3, 4, 16, 16)
    # normalized space
    assert abs(float(np.asarray(out["pixel_values"]).mean())) < 3.0
    np.testing.assert_array_equal(out["input_ids"], [[7, 7, 7], [7, 7, 1]])
    np.testing.assert_array_equal(out["attention_mask"], [[1, 1, 1], [1, 1, 0]])


def test_process_single_video_adds_batch():
    proc = VideoBlipProcessor(_Tok(), image_size=16)
    video = np.zeros((3, 2, 16, 16), np.uint8)
    out = proc(video=video)
    assert out["pixel_values"].shape == (1, 3, 2, 16, 16)
