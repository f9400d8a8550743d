"""Raw-array frame cache: save/load round trips must be bit-identical to the
PNG path (PNG is lossless, so both formats must yield the same frames), and
FrameDataset must consume either transparently through the same CSV contract
(reference scripts/ego4d/extract_frames.py:33-46,90-134)."""

import csv

import numpy as np
import pytest

from eilev_tpu.data.frame import FrameDataset, load_frame_video, save_frame_video


@pytest.fixture()
def clip():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, size=(3, 4, 16, 16), dtype=np.uint8)


def test_raw_round_trip_bit_identical(tmp_path, clip):
    save_frame_video(tmp_path, "vid|0", clip, fmt="png")
    save_frame_video(tmp_path, "vid|1", clip, fmt="raw")
    png = load_frame_video(tmp_path / "vid|0")
    raw = load_frame_video(tmp_path / "vid|1")
    np.testing.assert_array_equal(png, clip)
    np.testing.assert_array_equal(raw, clip)
    assert raw.dtype == np.uint8


def test_raw_preferred_over_png(tmp_path, clip):
    """A clip dir holding both formats loads the raw file (zero-decode path)."""
    save_frame_video(tmp_path, "vid|0", clip, fmt="png")
    other = clip.copy()
    other[0, 0, 0, 0] ^= 0xFF
    np.save(tmp_path / "vid|0" / "vid|0.npy", other)
    loaded = load_frame_video(tmp_path / "vid|0")
    np.testing.assert_array_equal(loaded, other)


def test_raw_rejects_wrong_layout(tmp_path, clip):
    d = tmp_path / "vid|0"
    d.mkdir()
    np.save(d / "vid|0.npy", clip.astype(np.float32))
    with pytest.raises(ValueError, match="uint8"):
        load_frame_video(d)


def test_unknown_format_rejected(tmp_path, clip):
    with pytest.raises(ValueError, match="png, raw"):
        save_frame_video(tmp_path, "vid|0", clip, fmt="jpeg")


def test_frame_dataset_reads_raw(tmp_path, clip):
    save_frame_video(tmp_path, "vidA|0", clip, fmt="raw")
    save_frame_video(tmp_path, "vidB|0", clip[:, ::-1].copy(), fmt="png")
    with open(tmp_path / "narrated_actions.csv", "w", newline="") as f:
        w = csv.DictWriter(
            f,
            [
                "frame_path", "video_uid", "clip_index", "narration_timestamp_sec",
                "narration_text", "structured_verb", "structured_noun",
            ],
        )
        w.writeheader()
        for fp, uid in [("vidA|0", "vidA"), ("vidB|0", "vidB")]:
            w.writerow(
                {
                    "frame_path": fp, "video_uid": uid, "clip_index": 0,
                    "narration_timestamp_sec": 1.0, "narration_text": "#C C does x",
                    "structured_verb": "do", "structured_noun": "x",
                }
            )
    ds = FrameDataset(str(tmp_path))
    np.testing.assert_array_equal(ds[0]["video"], clip)
    np.testing.assert_array_equal(ds["vidB|0"]["video"], clip[:, ::-1])
    # string indexing hits the same loader
    np.testing.assert_array_equal(ds["vidA|0"]["video"], clip)
