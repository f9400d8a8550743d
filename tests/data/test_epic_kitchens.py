"""EpicKitchensDataset: EK-55/EK-100 path resolution, timestamp handling, decode."""

import csv
import random

import pytest

from eilev_tpu.data.video_datasets import EpicKitchensDataset
from eilev_tpu.native import decoder_available

from .test_native_decoder import _write_y4m

pytestmark = pytest.mark.skipif(not decoder_available(), reason="native decoder unavailable")


@pytest.fixture(scope="module")
def ek_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("ek")
    ek55 = root / "ek55"
    ek100 = root / "ek100"
    # EK-55 video in the train tree
    d = ek55 / "videos/train/P01"
    d.mkdir(parents=True)
    _write_y4m(str(d / "P01_01.MP4"), nframes=150, w=32, h=16, fps=10)
    # EK-55 video that only exists in the test tree
    d2 = ek55 / "videos/test/P02"
    d2.mkdir(parents=True)
    _write_y4m(str(d2 / "P02_03.MP4"), nframes=150, w=32, h=16, fps=10)
    # EK-100 video (P..._1xx)
    d3 = ek100 / "P01/videos"
    d3.mkdir(parents=True)
    _write_y4m(str(d3 / "P01_101.MP4"), nframes=150, w=32, h=16, fps=10)

    ann = root / "ann.csv"
    with open(ann, "w", newline="") as f:
        w = csv.DictWriter(
            f,
            ["video_id", "narration", "narration_timestamp", "start_timestamp", "stop_timestamp"],
        )
        w.writeheader()
        w.writerow(dict(video_id="P01_01", narration="open door",
                        narration_timestamp="00:00:05.00",
                        start_timestamp="00:00:04.00", stop_timestamp="00:00:06.00"))
        # no narration timestamp -> clip midpoint
        w.writerow(dict(video_id="P02_03", narration="wash carrot",
                        narration_timestamp="",
                        start_timestamp="00:00:02.00", stop_timestamp="00:00:10.00"))
        w.writerow(dict(video_id="P01_101", narration="cut onion",
                        narration_timestamp="00:00:07.00",
                        start_timestamp="00:00:06.00", stop_timestamp="00:00:08.00"))
    return root, str(ek55), str(ek100), str(ann)


def test_path_resolution_and_iteration(ek_world):
    root, ek55, ek100, ann = ek_world
    ds = EpicKitchensDataset(ann, ek55, ek100, num_frames=4, rng=random.Random(0))
    assert len(ds) == 3
    items = list(ds)
    assert len(items) == 3
    by_id = {it["video_id"]: it for it in items}
    assert set(by_id) == {"P01_01", "P02_03", "P01_101"}
    for it in items:
        assert it["video"].shape == (3, 4, 16, 32)
    # midpoint fallback for the missing narration timestamp
    assert by_id["P02_03"]["narration_timestamp_sec"] == pytest.approx(6.0)


def test_missing_video_raises(ek_world, tmp_path):
    root, ek55, ek100, _ = ek_world
    ann = tmp_path / "bad.csv"
    with open(ann, "w", newline="") as f:
        w = csv.DictWriter(
            f, ["video_id", "narration", "narration_timestamp", "start_timestamp", "stop_timestamp"]
        )
        w.writeheader()
        w.writerow(dict(video_id="P09_09", narration="x", narration_timestamp="00:00:01.00",
                        start_timestamp="00:00:00.00", stop_timestamp="00:00:02.00"))
    with pytest.raises(FileNotFoundError):
        EpicKitchensDataset(str(ann), ek55, ek100, num_frames=2)
