"""Chat orchestration tests (mirror of ChatOrchestrationServiceTests.cs)."""

from datetime import datetime, timezone

import pytest

from omni_recall_tpu.chat.orchestration import (
    ChatOrchestrationService,
    build_grounded_prompt,
    build_recall_only_fallback_answer,
    has_sufficient_evidence,
    post_process_answer,
)
from omni_recall_tpu.chat.router import AiChatRouter, AiProviderUnavailableError, AiRateLimitError
from omni_recall_tpu.config import AiRoutingOptions, ChatQualityOptions
from omni_recall_tpu.contracts import AiChatResponse, RecallCitation, RecallSearchResponse

NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)


def _citation(i, score=0.5, file_name=None):
    return RecallCitation(
        document_id=f"doc_{i}",
        file_name=file_name or f"file{i}.txt",
        chunk_id=f"doc_{i}:0000",
        chunk_index=0,
        snippet=f"snippet {i}",
        score=score,
        created_at_utc=NOW,
    )


class StubRecallSearchService:
    def __init__(self, citations):
        self.citations = citations

    def search(self, query, top_k, now=None):
        return RecallSearchResponse(query, self.citations)


class ScriptedClient:
    def __init__(self, name, steps):
        self.provider_name = name
        self.steps = list(steps)

    def complete(self, request):
        step = self.steps.pop(0)
        if isinstance(step, Exception):
            raise step
        return step


def _service(citations, steps, options=None, fallback_steps=None):
    router = AiChatRouter(
        ScriptedClient("primary", steps),
        ScriptedClient("fallback", fallback_steps or []),
        AiRoutingOptions(max_attempts_per_provider=1, retry_base_delay_ms=0),
    )
    return ChatOrchestrationService(StubRecallSearchService(citations), router, options)


# -- evidence guard --

def test_guard_blocks_when_no_citations():
    svc = _service([], [])
    response = svc.complete("question", 5)
    assert response.provider == "guard"
    assert response.model == "insufficient-evidence"
    assert response.citations == []


def test_guard_blocks_when_all_scores_weak():
    options = ChatQualityOptions(minimum_strong_citation_score=0.9)
    svc = _service([_citation(1, score=0.2)], [], options)
    response = svc.complete("question", 5)
    assert response.provider == "guard"


def test_guard_passes_with_one_strong_citation():
    options = ChatQualityOptions(minimum_strong_citation_score=0.25)
    svc = _service(
        [_citation(1, score=0.1), _citation(2, score=0.3)],
        [AiChatResponse("grounded answer [1]", "m", "primary")],
        options,
    )
    response = svc.complete("question", 5)
    assert response.provider == "primary"


def test_guard_minimum_citation_count():
    options = ChatQualityOptions(minimum_citation_count=3)
    svc = _service([_citation(1), _citation(2)], [], options)
    assert svc.complete("q", 5).provider == "guard"


# -- grounded prompt --

def test_grounded_prompt_contents():
    citations = [_citation(1, score=0.7312), _citation(2, score=0.25)]
    prompt = build_grounded_prompt("What is recall?", citations)
    assert "[1] file=file1.txt chunk=0 score=0.7312" in prompt
    assert "[2] file=file2.txt chunk=0 score=0.2500" in prompt
    assert "snippet 1" in prompt
    assert "Question: What is recall?" in prompt
    assert "cite snippet numbers like [1], [2]" in prompt


def test_grounded_prompt_no_context():
    prompt = build_grounded_prompt("q", [])
    assert "[no context]" in prompt


# -- post-processing --

def test_post_process_keeps_valid_markers_and_filters_citations():
    citations = [_citation(1), _citation(2), _citation(3)]
    answer, returned = post_process_answer("Use [2] and also [2] plus [7].", citations)
    assert answer == "Use [2] and also [2] plus ."
    assert [c.document_id for c in returned] == ["doc_2"]


def test_post_process_returns_all_citations_when_none_referenced():
    citations = [_citation(1), _citation(2)]
    answer, returned = post_process_answer("No markers here.", citations)
    assert returned == citations


def test_post_process_whitespace_normalization_preserves_paragraphs():
    citations = [_citation(1)]
    raw = "Line one.  With   spaces.\n\n\n\nNext paragraph.\tTabbed  [1]"
    answer, _ = post_process_answer(raw, citations)
    assert "  " not in answer.replace("\n", "")
    assert "\n\n\n" not in answer
    assert "Next paragraph." in answer


def test_post_process_empty_answer():
    assert post_process_answer("   ", [_citation(1)]) == ("", [])


def test_post_process_no_citations_trims_only():
    answer, returned = post_process_answer("  raw [1] answer  ", [])
    assert answer == "raw [1] answer"
    assert returned == []


# -- recall-only fallback --

def test_recall_only_fallback_on_provider_unavailable():
    options = ChatQualityOptions(
        enable_recall_only_fallback_on_provider_failure=True,
        recall_only_fallback_max_citations=2,
    )
    citations = [_citation(1, score=0.9), _citation(2, score=0.8), _citation(3, score=0.7)]
    svc = _service(
        citations,
        [AiRateLimitError("p")],
        options,
        fallback_steps=[AiRateLimitError("f")],
    )
    response = svc.complete("question", 5)
    assert response.provider == "recall-only"
    assert response.model == "free-tier-fallback"
    assert "Top retrieved evidence:" in response.answer
    assert "[1] file1.txt (chunk 0, score 0.900)" in response.answer
    assert "[3]" not in response.answer  # truncated at max 2
    assert response.citations == citations


def test_provider_unavailable_raises_when_fallback_disabled():
    options = ChatQualityOptions(enable_recall_only_fallback_on_provider_failure=False)
    svc = _service(
        [_citation(1, score=0.9)],
        [AiRateLimitError("p")],
        options,
        fallback_steps=[AiRateLimitError("f")],
    )
    with pytest.raises(AiProviderUnavailableError):
        svc.complete("question", 5)


def test_fallback_answer_without_citations_is_plain_message():
    options = ChatQualityOptions()
    assert (
        build_recall_only_fallback_answer([], options)
        == options.recall_only_fallback_message
    )


def test_has_sufficient_evidence_threshold_clamped_non_negative():
    options = ChatQualityOptions(minimum_strong_citation_score=-5.0)
    assert has_sufficient_evidence([_citation(1, score=0.0)], options) is True
