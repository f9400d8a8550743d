"""Host-side tooling CLIs: splits, annotation backfill, combine, select, plot."""

import csv
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


pytestmark = pytest.mark.slow  # CLI integration chain


def _run(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable] + args, capture_output=True, text=True, cwd=REPO, env=env, timeout=300
    )
    assert proc.returncode == 0, f"{args}\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    return proc.stdout


@pytest.fixture()
def fho_world(tmp_path):
    videos = tmp_path / "videos"
    videos.mkdir()
    fho = {"videos": []}
    for i in range(6):
        uid = f"vid{i}"
        (videos / f"{uid}.mp4").write_bytes(b"x")  # existence is all the split needs
        actions = [
            {
                "is_rejected": False,
                "is_valid_action": True,
                "narration_text": f"#C C does {j}",
                "structured_verb": ["take", "cut"][j % 2],
                "frames": [
                    {
                        "frame_type": "pnr_frame",
                        "boxes": [{"object_type": "object_of_change", "structured_noun": "knife"}],
                    }
                ],
            }
            for j in range(i + 1)
        ]
        fho["videos"].append({"video_uid": uid, "annotated_intervals": [{"narrated_actions": actions}]})
    (tmp_path / "fho_main.json").write_text(json.dumps(fho))
    return tmp_path


def test_split_train_val_test(fho_world):
    out = fho_world / "splits"
    _run(
        [
            "scripts/ego4d/split_train_val_test.py",
            str(fho_world / "fho_main.json"),
            str(out),
            str(fho_world / "videos"),
        ]
    )
    splits = {}
    total = 0
    all_videos = set()
    for name in ("train", "val", "test"):
        data = json.load(open(out / f"fho_main_{name}.json"))
        assert data["split"] == name
        splits[name] = data["videos"]
        total += sum(data["videos"].values())
        assert not (set(data["videos"]) & all_videos), "videos must not cross splits"
        all_videos |= set(data["videos"])
    assert total == 6 + 5 + 4 + 3 + 2 + 1


def test_add_structured_verb_noun(fho_world, tmp_path):
    # a narrated_actions.csv without the structured columns
    src = tmp_path / "na.csv"
    with open(src, "w", newline="") as f:
        w = csv.DictWriter(
            f, ["frame_path", "video_uid", "clip_index", "narration_timestamp_sec", "narration_text"]
        )
        w.writeheader()
        w.writerow(
            dict(frame_path="vid2|1", video_uid="vid2", clip_index="1",
                 narration_timestamp_sec="4.0", narration_text="#C C does 1")
        )
    out = tmp_path / "na_full.csv"
    _run(
        [
            "scripts/ego4d/add_structured_verb_noun.py",
            str(fho_world / "fho_main.json"),
            str(src),
            str(out),
        ]
    )
    rows = list(csv.DictReader(open(out)))
    assert rows[0]["structured_verb"] == "cut"  # action index 1 -> cut
    assert rows[0]["structured_noun"] == "knife"


def test_held_out_split(tmp_path):
    na = tmp_path / "na.csv"
    with open(na, "w", newline="") as f:
        w = csv.DictWriter(f, ["frame_path", "structured_verb", "structured_noun"])
        w.writeheader()
        for i in range(20):
            w.writerow(dict(frame_path=f"f{i}", structured_verb="take", structured_noun="knife"))
        for i in range(2):
            w.writerow(dict(frame_path=f"r{i}", structured_verb="carve", structured_noun="ice"))
    out = tmp_path / "split"
    _run(
        [
            "scripts/ego4d/split_held_out_verb_noun_train_val_test.py",
            str(na), str(out), "0.75", "--num_common_action", "1",
        ]
    )
    train = list(csv.DictReader(open(out / "train.csv")))
    val = list(csv.DictReader(open(out / "val.csv")))
    test = list(csv.DictReader(open(out / "test.csv")))
    assert len(train) + len(val) == 20  # common pair
    assert len(test) == 2  # rare pair held out
    assert all(r["structured_verb"] == "carve" for r in test)


def test_combine_and_select(tmp_path):
    gen = tmp_path / "gen.csv"
    with open(gen, "w", newline="") as f:
        w = csv.DictWriter(f, ["frame_path", "video_uid", "clip_index", "generated", "ground_truth"])
        w.writeheader()
        w.writerow(dict(frame_path="q1", video_uid="v", clip_index="0",
                        generated="The camera wearer cuts.", ground_truth="The camera wearer cuts."))
    ann = tmp_path / "ann.csv"
    with open(ann, "w", newline="") as f:
        w = csv.DictWriter(f, ["frame_path", "structured_verb", "structured_noun", "narration_text"])
        w.writeheader()
        for fp in ("q1", "c1", "c2"):
            w.writerow(dict(frame_path=fp, structured_verb="cut", structured_noun="knife",
                            narration_text="#C C cuts"))
    icl = tmp_path / "icl.jsonl"
    icl.write_text(json.dumps({"context": ["c1", "c2"], "query": "q1"}) + "\n")

    combined = tmp_path / "combined.jsonl"
    _run(
        [
            "scripts/combine_in_context_examples_generated_narrations.py",
            "--generated_narrations", str(gen),
            "--annotations", str(ann),
            "--in_context_examples", str(icl),
            "--in_context_example_annotations", str(ann),
            "--output", str(combined),
        ]
    )
    row = json.loads(combined.read_text().strip())
    assert row["structured_verb"] == "cut"
    assert len(row["context"]) == 2

    selected = tmp_path / "selected.jsonl"
    _run(
        [
            "scripts/select_qualitative_examples.py",
            "--combined_jsonl", str(combined),
            "--metric", "rougeL", "--threshold", "0.9", "--above",
            "--output", str(selected),
        ]
    )
    assert len(selected.read_text().strip().splitlines()) == 1  # perfect match kept


def test_plot_results(tmp_path):
    for shot, v in [(0, 0.2), (16, 0.6)]:
        (tmp_path / f"r{shot}.json").write_text(json.dumps({"rougeL": v}))
    out = tmp_path / "plot.png"
    _run(
        [
            "scripts/plot_results.py",
            f"0={tmp_path}/r0.json", f"16={tmp_path}/r16.json",
            "--metric", "rougeL", "--with_published", "--out", str(out),
        ]
    )
    assert out.exists() and out.stat().st_size > 1000


def test_epic_kitchens_extract_frames_cli(tmp_path):
    from tests.data.test_native_decoder import _write_y4m

    ek55 = tmp_path / "ek55"
    ek100 = tmp_path / "ek100"
    d = ek55 / "videos/train/P01"
    d.mkdir(parents=True)
    _write_y4m(str(d / "P01_01.MP4"), nframes=120, w=32, h=16, fps=10)
    ann = tmp_path / "ann.csv"
    with open(ann, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video_id", "narration", "full_sent_narration", "verb", "noun",
                    "narration_timestamp", "start_timestamp", "stop_timestamp"])
        w.writerow(["P01_01", "open door", "The camera wearer opens the door.", "open",
                    "door", "00:00:05.00", "00:00:04.00", "00:00:06.00"])
    frames = tmp_path / "frames"
    _run([
        "scripts/epic_kitchens/epic_kitchens_extract_frames.py",
        "--annotation_path", str(ann),
        "--epic_kitchens_55_video_dir_path", str(ek55),
        "--epic_kitchens_100_video_dir_path", str(ek100),
        "--frames_dir", str(frames),
        "--num_subsample_frames", "4",
        "--target_size", "16",
    ])
    rows = list(csv.DictReader(open(frames / "narrated_actions.csv")))
    assert len(rows) == 1
    assert rows[0]["narration_text"] == "The camera wearer opens the door."
    assert rows[0]["structured_verb"] == "open"
    assert len(list((frames / rows[0]["frame_path"]).glob("*.png"))) == 4


def test_explore_data_cli(fho_world, tmp_path):
    """scripts/explore_data.py (the data-explorations surface): integrity
    counts, duration stats, verb/noun distributions, taxonomy coverage."""
    # add clip timing + one integrity violation to exercise the counters
    fho = json.load(open(fho_world / "fho_main.json"))
    for v in fho["videos"]:
        for itv in v["annotated_intervals"]:
            for j, a in enumerate(itv["narrated_actions"]):
                a["start_sec"] = float(j)
                a["clip_start_sec"] = float(j)
                a["clip_end_sec"] = float(j) + (9.0 if j % 3 == 0 else 4.0)
                a["freeform_verb"] = "grabs"
    fho["videos"][0]["annotated_intervals"][0]["narrated_actions"][0][
        "is_valid_action"
    ] = False  # not rejected + not valid -> inconsistent flag
    (fho_world / "fho_main2.json").write_text(json.dumps(fho))
    tax = {"verbs": ["take"], "nouns": ["knife"]}
    (fho_world / "tax.json").write_text(json.dumps(tax))

    out = _run([
        "scripts/explore_data.py",
        "--fho_main", str(fho_world / "fho_main2.json"),
        "--fho_lta_taxonomy", str(fho_world / "tax.json"),
        "--plot", str(tmp_path / "plots"),
    ])
    report = json.loads(out[: out.rindex("}") + 1])
    assert report["total_actions"] == 21
    assert report["inconsistent_valid_rejected"] == 1
    assert report["kept_by_filter"] == 20
    assert report["duration_sec"]["over_8s"] > 0
    verbs = dict(map(tuple, report["top_structured_verbs"]))
    assert set(verbs) == {"take", "cut"}
    assert report["taxonomy"]["verbs_outside_taxonomy"] == ["cut"]
    assert report["taxonomy"]["nouns_outside_taxonomy"] == []
    import os

    assert os.path.exists(tmp_path / "plots" / "action_durations.png")


@pytest.mark.parametrize(
    "figure",
    ["held-out-opt", "held-out-t5", "epic-kitchens-opt", "epic-kitchens-t5",
     "novel", "ablation-bursty", "ablation-skewed", "ablation-dynamic",
     "shuffle"],
)
def test_plot_results_figure_modes(tmp_path, figure):
    """One CLI command per reference figure notebook (published-curve modes)."""
    out = tmp_path / f"{figure}.png"
    _run(["scripts/plot_results.py", "--figure", figure, "--metric", "ROUGE-L",
          "--out", str(out)])
    assert out.exists() and out.stat().st_size > 1000


def test_plot_results_tsne(tmp_path):
    """--figure tsne over get_vision_model_embs.py-format embedding dumps
    (tsne_ego4d_epic_kitchens.ipynb role)."""
    import numpy as np

    rng = np.random.default_rng(0)
    for label in ("ego4d", "ek"):
        np.save(tmp_path / f"{label}_embs.npy",
                rng.normal(size=(40, 16)).astype(np.float32))
    out = tmp_path / "tsne.png"
    _run(["scripts/plot_results.py", "--figure", "tsne",
          f"ego4d={tmp_path}/ego4d", f"ek={tmp_path}/ek", "--out", str(out)])
    assert out.exists() and out.stat().st_size > 1000


def test_plot_results_action_freq(tmp_path):
    """--figure action-freq over narrated_actions.csv (skewed_dist role)."""
    path = tmp_path / "narrated_actions.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["structured_verb", "structured_noun"])
        w.writeheader()
        for verb, noun, n in [("take", "knife", 5), ("cut", "onion", 2), ("open", "door", 1)]:
            for _ in range(n):
                w.writerow({"structured_verb": verb, "structured_noun": noun})
    out = tmp_path / "freq.png"
    _run(["scripts/plot_results.py", "--figure", "action-freq", str(path),
          "--out", str(out)])
    assert out.exists() and out.stat().st_size > 1000
