"""Snippet building helper.

Mirrors the reference TextSnippetHelper
(src/OmniRecall.Api/Services/TextSnippetHelper.cs:5-11): newlines become
spaces, the result is trimmed, and content longer than ``max_length`` is
truncated with a ``...`` suffix. Search snippets use 180 chars
(RecallSearchService.cs:50); chunk previews use 220
(DocumentIngestionService.cs:204).
"""

from __future__ import annotations

SEARCH_SNIPPET_LEN = 180
PREVIEW_SNIPPET_LEN = 220


def build_snippet(content: str, max_length: int) -> str:
    normalized = content.replace("\n", " ").replace("\r", " ").strip()
    if len(normalized) <= max_length:
        return normalized
    return normalized[:max_length] + "..."
