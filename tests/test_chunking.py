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
