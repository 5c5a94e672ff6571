"""Sliding-window word chunker.

Behavior-compatible with the reference chunker
(src/OmniRecall.Api/Services/SlidingWindowTextChunker.cs:5-36):

- whitespace word split (any Unicode whitespace, empty entries removed),
- chunk_size = max(1, cfg), overlap = clamp(cfg, 0, chunk_size - 1),
  step = max(1, chunk_size - overlap),
- windows re-joined with single spaces,
- iteration stops once a window reaches the end of the word list.
"""

from __future__ import annotations


def chunk_text(text: str, chunk_size_words: int, chunk_overlap_words: int) -> list[str]:
    if not text or not text.strip():
        return []

    words = text.split()
    if not words:
        return []

    chunk_size = max(1, chunk_size_words)
    overlap = max(0, min(chunk_overlap_words, chunk_size - 1))
    step = max(1, chunk_size - overlap)

    chunks: list[str] = []
    i = 0
    n = len(words)
    while i < n:
        end = min(i + chunk_size, n)
        if end - i <= 0:
            break
        chunks.append(" ".join(words[i:end]))
        if i + chunk_size >= n:
            break
        i += step
    return chunks
