"""train_batch_iterator: static shapes, label masking, prompt-pool assembly."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from eilev_tpu.training.data_module import train_batch_iterator
from tests.data.mock_tokenizer import MockTokenizer


class _DS:
    """Interleaved-style dataset: {'items': [example, query]} with tiny videos."""

    def __init__(self, n=6, videos_per=2):
        self.n = n
        self.videos_per = videos_per
        rng = np.random.default_rng(0)
        self.videos = rng.integers(0, 256, (n, 3, 4, 16, 16)).astype(np.uint8)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        items = [
            {"narration_text": f"#C C does thing {j}", "video": self.videos[(i + j) % self.n]}
            for j in range(self.videos_per)
        ]
        return {"items": items}


@pytest.mark.parametrize("augment", [False, True])
def test_static_shapes_and_masking(augment):
    tok = MockTokenizer()
    ds = _DS()
    it = train_batch_iterator(
        ds,
        tok,
        num_query_tokens=3,
        decoder_only_lm=True,
        accum_steps=2,
        micro_batch_size=1,
        max_length=48,
        num_frames=2,
        image_size=16,
        augment=augment,
        seed=0,
        epochs=1,
    )
    batches = list(it)
    assert len(batches) == 3  # 6 samples / (2 accum * 1 micro)
    for b in batches:
        assert b["input_ids"].shape == (2, 1, 48)
        assert b["attention_mask"].shape == (2, 1, 48)
        assert b["labels"].shape == (2, 1, 48)
        assert b["video_input_mask"].shape == (2, 1, 48)
        # 2 videos per sample, (accum * micro * videos) clips
        assert b["pixel_values"].shape == (2, 2, 3, 2, 16, 16)
        assert np.isfinite(b["pixel_values"]).all()
        # padding region masked
        pad_region = b["attention_mask"] == 0
        assert (b["labels"][pad_region] == -100).all()
        # video positions have mask 1 and label -100
        vim = b["video_input_mask"].astype(bool)
        assert vim.sum() == 2 * 1 * 2 * 3  # accum*micro*videos*query_tokens
        assert (b["labels"][vim] == -100).all()
        # target text tokens exist (labels != -100 somewhere)
        assert (b["labels"] != -100).any()


def test_v1_mode():
    tok = MockTokenizer()

    class _V1DS(_DS):
        def __getitem__(self, i):
            return {"narration_text": f"#C C acts {i}", "video": self.videos[i]}

    ds = _V1DS()
    it = train_batch_iterator(
        ds,
        tok,
        num_query_tokens=3,
        decoder_only_lm=True,
        accum_steps=1,
        micro_batch_size=2,
        max_length=24,
        num_frames=2,
        image_size=16,
        augment=False,
        seed=0,
        epochs=1,
        interleaved=False,
    )
    b = next(iter(it))
    assert b["input_ids"].shape == (1, 2, 24)
    assert b["pixel_values"].shape == (1, 2, 3, 2, 16, 16)
    assert "video_input_mask" not in b


def test_multihost_striding_disjoint_and_complete():
    """process_index/process_count: the hosts' streams partition each epoch's
    shuffled order exactly (DistributedSampler semantics) - verified on the
    dataset access pattern, since prompt-pool randomness makes token content
    rng-order dependent."""
    tok = MockTokenizer()

    class _Rec(_DS):
        def __init__(self):
            super().__init__()
            self.seen = []

        def __getitem__(self, i):
            self.seen.append(i)
            return super().__getitem__(i)

    def indices_seen(proc, nproc):
        ds = _Rec()
        it = train_batch_iterator(
            ds, tok,
            num_query_tokens=3, decoder_only_lm=True,
            accum_steps=1, micro_batch_size=1,
            max_length=48, num_frames=2, image_size=16,
            augment=False, seed=0, epochs=1,
            process_index=proc, process_count=nproc,
        )
        n_batches = sum(1 for _ in it)
        return ds.seen, n_batches

    full, n_full = indices_seen(0, 1)
    h0, n0 = indices_seen(0, 2)
    h1, n1 = indices_seen(1, 2)
    assert n_full == 6 and n0 == 3 and n1 == 3
    # same seeded shuffle on every host, disjoint strides that partition it
    assert h0 == full[0::2]
    assert h1 == full[1::2]
    assert not set(h0) & set(h1)
    assert sorted(h0 + h1) == sorted(full)


def _make_frames_dir(root):
    """Tiny PNG frames tree (same contract as extract_frames output)."""
    import csv

    import imageio.v3 as iio

    rows = []
    actions = [("take", "knife"), ("take", "spoon"), ("cut", "knife"),
               ("cut", "onion"), ("wash", "knife"), ("stir", "pot")]
    for i, (verb, noun) in enumerate(actions):
        fp = f"vid{i}|0"
        d = root / fp
        d.mkdir(parents=True)
        for t in range(2):
            img = np.full((8, 8, 3), i * 10 + t, np.uint8)
            iio.imwrite(d / f"{fp}|{t}.png", img, extension=".png")
        rows.append({
            "frame_path": fp, "video_uid": f"vid{i}", "clip_index": "0",
            "narration_timestamp_sec": "4.0",
            "narration_text": f"#C C does action {i}",
            "structured_verb": verb, "structured_noun": noun,
        })
    with open(root / "narrated_actions.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)


def test_num_workers_batches_bit_identical(tmp_path):
    """The thread-pool loader must produce BIT-identical batches to serial
    iteration for the same seed: all rng (in-context choice, prompt choice,
    epoch shuffle) is drawn on the coordinating thread in stream order."""
    import random

    from eilev_tpu.data.frame import FrameInterleavedDataset

    _make_frames_dir(tmp_path / "frames")
    tok = MockTokenizer()

    def batches(workers):
        ds = FrameInterleavedDataset(
            str(tmp_path / "frames"),
            num_in_context_examples_per_sample=2,
            rng=random.Random(7),
        )
        it = train_batch_iterator(
            ds, tok, num_query_tokens=2, decoder_only_lm=True,
            accum_steps=1, micro_batch_size=2, max_length=64, num_frames=2,
            image_size=8, augment=False, seed=3, epochs=2,
            num_workers=workers,
        )
        return list(it)

    serial = batches(0)
    parallel = batches(3)
    assert len(serial) == len(parallel) and len(serial) > 1
    for a, b in zip(serial, parallel):
        assert sorted(a) == sorted(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_num_workers_requires_plannable_dataset():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="plan"):
        next(
            train_batch_iterator(
                _DS(), MockTokenizer(), num_query_tokens=2, decoder_only_lm=True,
                accum_steps=1, micro_batch_size=1, max_length=32, num_frames=2,
                image_size=8, augment=False, num_workers=2,
            )
        )
