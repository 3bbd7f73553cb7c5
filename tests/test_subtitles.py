"""SRT parsing (operators/subtitles.py): timing math, tolerance,
two-line cues, WebVTT-style dot separators."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_etl_self_service_spark.operators.subtitles import (
    build_srt,
    cue_duration_ms,
    cue_start_ms,
    parse_srt,
)


def test_roundtrip_various_lengths():
    for n in (1, 4, 5, 8, 9, 99):
        text = " ".join(f"w{i}" for i in range(n))
        cues = parse_srt(build_srt(text, 3))
        assert " ".join(c["text"] for c in cues) == text
        assert len(cues) == -(-n // 8)
        for i, c in enumerate(cues):
            assert c["index"] == i + 1
            assert c["start_ms"] == cue_start_ms(3, i)
            assert c["end_ms"] - c["start_ms"] == cue_duration_ms(i)


def test_two_line_cues_join_with_space():
    cues = parse_srt("1\n00:00:00,000 --> 00:00:02,000\nline one\nline two\n")
    assert cues[0]["text"] == "line one line two"


def test_dot_millisecond_separator_accepted():
    """WebVTT writes HH:MM:SS.mmm; tolerate it in SRT-labeled files."""
    cues = parse_srt("1\n00:00:01.500 --> 00:00:03.250\nhello\n")
    assert cues[0]["start_ms"] == 1500 and cues[0]["end_ms"] == 3250


def test_bad_cues_skipped_not_raised():
    raw = (
        "1\n00:00:00,000 --> 00:00:01,000\nok\n\n"
        "2\nnot a timing line\nskipped\n\n"
        "3\n00:00:05,000 --> 00:00:06,000\nalso ok\n"
    )
    cues = parse_srt(raw)
    assert [c["text"] for c in cues] == ["ok", "also ok"]


def test_missing_index_tolerated():
    cues = parse_srt("00:01:00,000 --> 00:01:02,000\nno index\n")
    assert cues[0]["index"] is None and cues[0]["start_ms"] == 60000


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=300))
def test_parse_never_raises(raw):
    for c in parse_srt(raw):
        assert isinstance(c["start_ms"], int)
