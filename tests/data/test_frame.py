"""Frame dataset + ICL sampling tests (reference tests/data/test_frame.py rebuilt
with real tiny PNG fixtures instead of mocks, plus deterministic injected RNG)."""

import csv
import random

import numpy as np
import pytest

from eilev_tpu.data import (
    FrameDataset,
    FrameInterleavedDataset,
    FrameInterleavedPresampledDataset,
)


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory):
    """8 clips x 2 frames of 4x4 PNG, with verb/noun structure:

    idx verb      noun
    0   take      knife
    1   take      spoon
    2   cut       knife
    3   cut       onion
    4   wash      knife
    5   take      knife   (same action as 0)
    6   [other]   ''      (excluded from buckets)
    7   stir      pot
    """
    import imageio.v3 as iio

    root = tmp_path_factory.mktemp("frames")
    rows = []
    actions = [
        ("take", "knife"),
        ("take", "spoon"),
        ("cut", "knife"),
        ("cut", "onion"),
        ("wash", "knife"),
        ("take", "knife"),
        ("[other]", ""),
        ("stir", "pot"),
    ]
    for i, (verb, noun) in enumerate(actions):
        fp = f"vid{i}|0"
        d = root / fp
        d.mkdir()
        for t in range(2):
            img = np.full((4, 4, 3), i * 10 + t, np.uint8)
            iio.imwrite(d / f"{fp}|{t}.png", img, extension=".png")
        rows.append(
            {
                "frame_path": fp,
                "video_uid": f"vid{i}",
                "clip_index": "0",
                "narration_timestamp_sec": "4.0",
                "narration_text": f"#C C does action {i}",
                "structured_verb": verb,
                "structured_noun": noun,
            }
        )
    with open(root / "narrated_actions.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    return root


def test_frame_dataset_loading(frames_dir):
    ds = FrameDataset(str(frames_dir))
    assert len(ds) == 8
    item = ds[0]
    assert item["video"].shape == (3, 2, 4, 4)
    assert item["video"].dtype == np.uint8
    # frames sorted by index: frame 0 has value 0, frame 1 value 1
    assert item["video"][0, 0, 0, 0] == 0 and item["video"][0, 1, 0, 0] == 1
    # string (frame_path) indexing, reference frame.py:53-57
    item2 = ds["vid3|0"]
    assert item2["structured_noun"] == "onion"
    # filter
    ds_f = FrameDataset(str(frames_dir), data_filter=lambda r: r["structured_verb"] == "take")
    assert len(ds_f) == 3
    # no frames mode
    ds_nf = FrameDataset(str(frames_dir), return_frames=False)
    assert "video" not in ds_nf[0]


def test_interleaved_bucket_sampling(frames_dir):
    ds = FrameInterleavedDataset(
        str(frames_dir),
        num_in_context_examples_per_sample=4,
        return_frames=False,
        rng=random.Random(0),
    )
    item = ds[0]  # query: take/knife
    assert len(item["items"]) == 5
    assert item["items"][-1]["frame_path"] == "vid0|0"  # query last
    examples = item["items"][:-1]
    paths = {e["frame_path"] for e in examples}
    # the query itself and its exact duplicate action (take/knife = idx 5) are
    # excluded from verb/noun buckets
    assert "vid0|0" not in paths
    for e in examples:
        # every bucket example shares the verb (take, different noun) or the noun
        # (knife, different verb) - or came from the rest-fallback
        assert not (
            e["structured_verb"] == "take" and e["structured_noun"] == "knife"
        )


def test_interleaved_deterministic_with_seeded_rng(frames_dir):
    a = FrameInterleavedDataset(
        str(frames_dir), num_in_context_examples_per_sample=3, return_frames=False,
        rng=random.Random(7),
    )
    b = FrameInterleavedDataset(
        str(frames_dir), num_in_context_examples_per_sample=3, return_frames=False,
        rng=random.Random(7),
    )
    for i in range(len(a)):
        assert [x["frame_path"] for x in a[i]["items"]] == [
            x["frame_path"] for x in b[i]["items"]
        ]


def test_interleaved_random_examples(frames_dir):
    ds = FrameInterleavedDataset(
        str(frames_dir),
        num_in_context_examples_per_sample=4,
        return_frames=False,
        random_in_context_examples=True,
        rng=random.Random(1),
    )
    item = ds[2]
    assert len(item["items"]) == 5
    assert item["items"][-1]["frame_path"] == "vid2|0"
    assert all(e["frame_path"] != "vid2|0" for e in item["items"][:-1])


def test_interleaved_upsampling(frames_dir):
    # 8 originals + 7 action buckets x floor((22-8)/7)=2 each = 22 exactly
    ds = FrameInterleavedDataset(
        str(frames_dir),
        num_in_context_examples_per_sample=2,
        return_frames=False,
        target_dataset_len=22,
        rng=random.Random(2),
    )
    assert len(ds) == 22
    # non-divisible target: the reference's per-bucket floor lands just below
    ds2 = FrameInterleavedDataset(
        str(frames_dir),
        num_in_context_examples_per_sample=2,
        return_frames=False,
        target_dataset_len=16,
        rng=random.Random(2),
    )
    assert 15 <= len(ds2) <= 16


def test_interleaved_separate_example_dataset(frames_dir):
    ds = FrameInterleavedDataset(
        str(frames_dir),
        in_context_example_frames_dir=str(frames_dir),
        num_in_context_examples_per_sample=4,
        return_frames=False,
        rng=random.Random(3),
    )
    # separate dataset: the query index is NOT excluded (reference semantics)
    item = ds[0]
    assert len(item["items"]) == 5


def test_presampled_dataset(frames_dir, tmp_path):
    import json

    map_file = tmp_path / "map.jsonl"
    with open(map_file, "w") as f:
        f.write(json.dumps({"context": ["vid1|0", "vid2|0"], "query": "vid0|0"}) + "\n")
        f.write(json.dumps({"context": ["vid3|0"], "query": "vid7|0"}) + "\n")
    ds = FrameInterleavedPresampledDataset(
        str(frames_dir),
        in_context_query_map_file_path=str(map_file),
        in_context_example_frames_dir=str(frames_dir),
    )
    assert len(ds) == 2
    item = ds[0]
    assert [x["frame_path"] for x in item["items"]] == ["vid1|0", "vid2|0", "vid0|0"]
    assert item["items"][0]["video"].shape == (3, 2, 4, 4)


def test_presampled_derangement_shuffle(frames_dir, tmp_path):
    import json

    map_file = tmp_path / "map.jsonl"
    with open(map_file, "w") as f:
        f.write(
            json.dumps(
                {"context": ["vid1|0", "vid2|0", "vid3|0", "vid4|0"], "query": "vid0|0"}
            )
            + "\n"
        )
    ds = FrameInterleavedPresampledDataset(
        str(frames_dir),
        in_context_query_map_file_path=str(map_file),
        in_context_example_frames_dir=str(frames_dir),
        shuffle_in_context_example_frames=True,
        rng=random.Random(5),
    )
    item = ds[0]
    # frame pixel values encode the original clip id: i*10 + t. After the
    # derangement, NO example keeps its own frames.
    for j, ex in enumerate(item["items"][:-1]):
        original_clip = j + 1  # vid1..vid4
        assert ex["video"][0, 0, 0, 0] != original_clip * 10


def test_clip_sampler():
    from fractions import Fraction

    from eilev_tpu.data import NarratedActionClipSampler

    sampler = NarratedActionClipSampler(random=False)
    ann = {
        "narrated_actions": [
            {"narration_timestamp_sec": 2.0},   # near start: clamps to [0, 8]
            {"narration_timestamp_sec": 50.0},  # centered: [46, 54]
            {"narration_timestamp_sec": 99.0},  # near end: clamps to [92, 100]
        ]
    }
    infos = [sampler(0.0, Fraction(100), ann) for _ in range(3)]
    assert (infos[0].clip_start_sec, infos[0].clip_end_sec) == (0, 8)
    assert (infos[1].clip_start_sec, infos[1].clip_end_sec) == (46, 54)
    assert (infos[2].clip_start_sec, infos[2].clip_end_sec) == (92, 100)
    assert [i.clip_index for i in infos] == [0, 1, 2]
    assert [i.is_last_clip for i in infos] == [False, False, True]
    # sampler resets after the last clip
    again = sampler(0.0, Fraction(100), ann)
    assert again.clip_index == 0

    # shuffled order is deterministic under an injected rng and covers all clips
    s1 = NarratedActionClipSampler(random=True, rng=random.Random(9))
    s2 = NarratedActionClipSampler(random=True, rng=random.Random(9))
    o1 = [s1(0.0, Fraction(100), ann).clip_index for _ in range(3)]
    o2 = [s2(0.0, Fraction(100), ann).clip_index for _ in range(3)]
    assert o1 == o2 and sorted(o1) == [0, 1, 2]
