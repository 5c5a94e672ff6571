"""Parity oracle unit tests (the behavioral contract for every backend).

Mirrors the score-shape assertions in the reference's
RecallSearchServiceTests.cs (embedding-dominant ranking, keyword fallback,
stop-word dilution).
"""

import math
from datetime import datetime, timedelta, timezone

from omni_recall_tpu.ops import oracle


NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)


def test_cosine_orthogonal_and_parallel():
    assert oracle.cosine_similarity([1.0, 0.0], [0.0, 1.0]) == 0.0
    assert abs(oracle.cosine_similarity([1.0, 0.0], [2.0, 0.0]) - 1.0) < 1e-12


def test_cosine_empty_or_mismatched_vectors_return_zero():
    assert oracle.cosine_similarity([], [1.0]) == 0.0
    assert oracle.cosine_similarity([1.0], []) == 0.0
    assert oracle.cosine_similarity([1.0, 2.0], [1.0]) == 0.0
    assert oracle.cosine_similarity(None, [1.0]) == 0.0
    assert oracle.cosine_similarity([0.0, 0.0], [0.0, 0.0]) == 0.0


def test_keyword_substring_not_token_match():
    # "optim" matches "optimization" by substring containment
    # (RecallSearchService.cs:111)
    assert oracle.keyword_score("optim", "great optimization tips") == 1.0


def test_keyword_stopword_filter_and_fallback():
    # non-stop-words survive filtering
    assert oracle.keyword_score("the cat", "a cat sat") == 1.0  # only "cat" counts
    # ALL stop words -> fall back to raw terms (:107-108)
    assert oracle.keyword_score("the of", "the end") == 0.5


def test_keyword_distinct_terms():
    assert oracle.keyword_score("cat cat dog", "cat") == 0.5


def test_keyword_empty_inputs():
    assert oracle.keyword_score("", "content") == 0.0
    assert oracle.keyword_score("query", "  ") == 0.0


def test_recency_decay():
    assert oracle.recency_score(NOW, NOW) == 1.0
    thirty = oracle.recency_score(NOW - timedelta(days=30), NOW)
    assert abs(thirty - math.exp(-1.0)) < 1e-12
    # future timestamps clamp age at 0 (:117)
    assert oracle.recency_score(NOW + timedelta(days=5), NOW) == 1.0


def test_score_chunk_weights():
    score = oracle.score_chunk(
        query="cat",
        query_embedding=[1.0, 0.0],
        chunk_embedding=[1.0, 0.0],
        content="cat content",
        created_at_utc=NOW,
        now=NOW,
    )
    assert abs(score - (0.7 + 0.2 + 0.1)) < 1e-12


def test_score_chunk_no_embedding_degrades_to_keyword_recency():
    score = oracle.score_chunk(
        query="cat",
        query_embedding=[],
        chunk_embedding=None,
        content="cat content",
        created_at_utc=NOW,
        now=NOW,
    )
    assert abs(score - 0.3) < 1e-12
