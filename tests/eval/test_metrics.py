"""Metric implementations vs known values / reference implementations."""

import numpy as np
import pytest

from eilev_tpu.eval.metrics import MulticlassF1, bleu, rouge_l


def test_bleu_perfect_and_zero():
    assert bleu(["the cat sat on the mat"], ["the cat sat on the mat"]) == pytest.approx(1.0)
    assert bleu(["completely different words here"], ["the cat sat on the mat"]) == 0.0


def test_bleu_known_value():
    # single 6-token prediction vs reference sharing 5 unigrams, 4 bigrams...
    pred = ["the cat sat on the mat"]
    ref = ["the cat sat on a mat"]
    # p1=5/6, p2=3/5, p3=2/4, p4=1/3; bp=1
    expected = (5 / 6 * 3 / 5 * 2 / 4 * 1 / 3) ** 0.25
    assert bleu(pred, ref) == pytest.approx(expected, rel=1e-6)


def test_bleu_brevity_penalty():
    pred = ["the cat"]
    ref = ["the cat sat"]
    # p1=2/2, p2=1/1 -> but 3- and 4-grams have zero possible -> standard zero
    assert bleu(pred, ref, max_order=2) == pytest.approx(
        1.0 * np.exp(1 - 3 / 2), rel=1e-6
    )


def test_rouge_l():
    assert rouge_l(["the cat sat"], ["the cat sat"]) == pytest.approx(1.0)
    # LCS("the cat sat on mat", "the dog sat on mat") = [the, sat, on, mat] = 4
    score = rouge_l(["the cat sat on mat"], ["the dog sat on mat"])
    assert score == pytest.approx(2 * (4 / 5) * (4 / 5) / (8 / 5), rel=1e-6)
    assert rouge_l(["xyz"], ["abc"]) == 0.0
    # tokenizer: case/punctuation insensitive
    assert rouge_l(["The CAT sat!"], ["the cat sat."]) == pytest.approx(1.0)


def test_multiclass_f1_matches_sklearn_macro():
    """torchmetrics 0.11 (the reference pin) macro == sklearn macro over ALL
    labels with zero_division=0."""
    sk = pytest.importorskip("sklearn.metrics")

    rng = np.random.default_rng(0)
    n_cls = 7
    preds = rng.integers(0, n_cls, 100)
    targets = rng.integers(0, n_cls, 100)
    ours = MulticlassF1(n_cls)
    ours.update(preds, targets)
    ref = sk.f1_score(targets, preds, average="macro", labels=list(range(n_cls)), zero_division=0)
    np.testing.assert_allclose(ours.compute(), ref, atol=1e-9)

    # streaming + classes absent from both preds and targets
    ours2 = MulticlassF1(n_cls)
    chunks = [(rng.integers(0, 3, 10), rng.integers(0, 3, 10)) for _ in range(5)]
    for p, t in chunks:
        ours2(p, t)
    all_p = np.concatenate([p for p, _ in chunks])
    all_t = np.concatenate([t for _, t in chunks])
    ref2 = sk.f1_score(all_t, all_p, average="macro", labels=list(range(n_cls)), zero_division=0)
    np.testing.assert_allclose(ours2.compute(), ref2, atol=1e-9)
