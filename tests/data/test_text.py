"""clean_narration_text / parse_timestamp / generate_chunks contract tests,
mirroring the regex cases of reference tests/data/test_utils.py:19-53,865-876."""

import pytest

from eilev_tpu.data.text import clean_narration_text, generate_chunks, parse_timestamp


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("#C C opens a drawer", "The camera wearer opens a drawer."),
        ("#C C opens a drawer.", "The camera wearer opens a drawer."),
        ("  #C C opens a drawer  ", "The camera wearer opens a drawer."),
        ("#c c opens a drawer", "The camera wearer opens a drawer."),
        ("#C C picks a knife <|eos|>", "The camera wearer picks a knife."),
        ("#C C picks a knife<|EOS|>", "The camera wearer picks a knife."),
        ("#C C stirs #unsure", "The camera wearer stirs."),
        ("#C C stirs #unsure.", "The camera wearer stirs."),
        ("#C C stirs the #unsure in the pot", "The camera wearer stirs the something in the pot."),
        ("#C C waves!", "The camera wearer waves!"),
        ("", ""),
        # a lone '#unsure' is a trailing '#unsure' -> removed entirely
        ("#unsure", ""),
    ],
)
def test_clean_narration_text(raw, expected):
    assert clean_narration_text(raw) == expected


def test_parse_timestamp():
    assert parse_timestamp("00:00:00.00") == 0.0
    assert parse_timestamp("00:01:30.50") == 90.5
    assert parse_timestamp("01:00:00.00") == 3600.0
    assert parse_timestamp("10:20:30.25") == pytest.approx(10 * 3600 + 20 * 60 + 30.25)


def test_generate_chunks():
    assert list(generate_chunks([1, 2, 3, 4, 5], 2)) == [[1, 2], [3, 4], [5]]
    assert list(generate_chunks([], 3)) == []
    assert list(generate_chunks([1], 5)) == [[1]]
