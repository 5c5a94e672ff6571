"""Chunker tests, mirroring SlidingWindowTextChunkerTests semantics."""

from omni_recall_tpu.chunking import chunk_text


def test_empty_and_whitespace_inputs():
    assert chunk_text("", 120, 24) == []
    assert chunk_text("   \n\t ", 120, 24) == []


def test_single_chunk_when_text_shorter_than_window():
    text = "one two three"
    assert chunk_text(text, 120, 24) == ["one two three"]


def test_windows_overlap_and_step():
    words = [f"w{i}" for i in range(10)]
    text = " ".join(words)
    chunks = chunk_text(text, 4, 2)
    # step = 2: windows [0:4], [2:6], [4:8], [6:10]; stops when window hits end
    assert chunks == [
        "w0 w1 w2 w3",
        "w2 w3 w4 w5",
        "w4 w5 w6 w7",
        "w6 w7 w8 w9",
    ]


def test_overlap_clamped_below_chunk_size():
    words = [f"w{i}" for i in range(6)]
    text = " ".join(words)
    # overlap 10 clamps to chunk_size-1=2 -> step 1
    chunks = chunk_text(text, 3, 10)
    assert chunks[0] == "w0 w1 w2"
    assert chunks[1] == "w1 w2 w3"
    # stops once i + chunk_size >= len
    assert chunks[-1] == "w3 w4 w5"


def test_chunk_size_clamped_to_at_least_one():
    chunks = chunk_text("alpha beta", 0, 0)
    assert chunks == ["alpha", "beta"]


def test_multiwhitespace_is_normalized():
    chunks = chunk_text("a \t b\n\n c", 10, 0)
    assert chunks == ["a b c"]


def test_last_partial_window_included():
    words = [f"w{i}" for i in range(5)]
    chunks = chunk_text(" ".join(words), 2, 0)
    assert chunks == ["w0 w1", "w2 w3", "w4"]


def test_information_separators_are_not_word_breaks():
    """C# char.IsWhiteSpace excludes U+001C..U+001F (Python's str.split
    treats them as whitespace): they must not shift chunk boundaries."""
    from omni_recall_tpu.chunking import _split_words

    assert _split_words("a\x1cb c") == ["a\x1cb", "c"]
    assert chunk_text("\x1c", 120, 24) == ["\x1c"]


def test_snippet_counts_utf16_units():
    from omni_recall_tpu.snippets import build_snippet

    emoji = "\U0001F600" * 100  # 200 UTF-16 units
    out = build_snippet(emoji, 180)
    assert out.endswith("...")
    # truncated to <= 180 units without a split surrogate pair
    assert len(out[:-3].encode("utf-16-le")) // 2 <= 180
    out.encode("utf-8")  # no lone surrogates


def test_iso_utc_trims_like_system_text_json():
    from datetime import datetime, timezone

    from omni_recall_tpu.contracts import iso_utc

    assert iso_utc(datetime(2026, 8, 1, tzinfo=timezone.utc)) == "2026-08-01T00:00:00Z"
    assert iso_utc(
        datetime(2026, 8, 1, 0, 0, 0, 500000, tzinfo=timezone.utc)
    ) == "2026-08-01T00:00:00.5Z"
    assert iso_utc(
        datetime(2026, 8, 1, 0, 0, 0, 123456, tzinfo=timezone.utc)
    ) == "2026-08-01T00:00:00.123456Z"
