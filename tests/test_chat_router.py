"""Router retry/failover matrix (mirror of AiChatRouterTests.cs) using a
scripted client with exact call-count assertions."""

import pytest

from omni_recall_tpu.chat.router import (
    AiChatRouter,
    AiProviderUnavailableError,
    AiRateLimitError,
    HttpRequestError,
)
from omni_recall_tpu.config import AiRoutingOptions
from omni_recall_tpu.contracts import AiChatRequest, AiChatResponse


class ScriptedChatClient:
    """Queue of response-or-exception steps (reference pattern:
    AiChatRouterTests.cs:79-114)."""

    def __init__(self, name, steps):
        self.provider_name = name
        self.steps = list(steps)
        self.call_count = 0

    def complete(self, request):
        self.call_count += 1
        step = self.steps.pop(0)
        if isinstance(step, Exception):
            raise step
        return step


def _opts(attempts=2):
    return AiRoutingOptions(max_attempts_per_provider=attempts, retry_base_delay_ms=0)


OK = AiChatResponse("answer", "model-x", "primary")
FALLBACK_OK = AiChatResponse("fb", "model-y", "fallback")


def test_primary_success_no_fallback():
    primary = ScriptedChatClient("primary", [OK])
    fallback = ScriptedChatClient("fallback", [])
    router = AiChatRouter(primary, fallback, _opts())
    assert router.complete(AiChatRequest("q")).provider == "primary"
    assert primary.call_count == 1
    assert fallback.call_count == 0


def test_transient_retry_then_success():
    primary = ScriptedChatClient("primary", [AiRateLimitError("429"), OK])
    fallback = ScriptedChatClient("fallback", [])
    router = AiChatRouter(primary, fallback, _opts(attempts=2))
    assert router.complete(AiChatRequest("q")).text == "answer"
    assert primary.call_count == 2
    assert fallback.call_count == 0


def test_transient_exhausted_fails_over():
    primary = ScriptedChatClient("primary", [TimeoutError(), HttpRequestError("boom")])
    fallback = ScriptedChatClient("fallback", [FALLBACK_OK])
    router = AiChatRouter(primary, fallback, _opts(attempts=2))
    assert router.complete(AiChatRequest("q")).provider == "fallback"
    assert primary.call_count == 2
    assert fallback.call_count == 1


def test_non_transient_fails_provider_immediately():
    primary = ScriptedChatClient("primary", [RuntimeError("bad config"), OK])
    fallback = ScriptedChatClient("fallback", [FALLBACK_OK])
    router = AiChatRouter(primary, fallback, _opts(attempts=3))
    assert router.complete(AiChatRequest("q")).provider == "fallback"
    assert primary.call_count == 1  # no retry on non-transient


def test_both_fail_raises_unavailable_with_inner_exceptions():
    p_exc = AiRateLimitError("p")
    f_exc = HttpRequestError("f")
    primary = ScriptedChatClient("primary", [p_exc])
    fallback = ScriptedChatClient("fallback", [f_exc])
    router = AiChatRouter(primary, fallback, _opts(attempts=1))
    with pytest.raises(AiProviderUnavailableError) as excinfo:
        router.complete(AiChatRequest("q"))
    assert excinfo.value.primary_exception is p_exc
    assert excinfo.value.fallback_exception is f_exc


def test_attempts_clamped_to_at_least_one():
    primary = ScriptedChatClient("primary", [OK])
    router = AiChatRouter(primary, ScriptedChatClient("fb", []), _opts(attempts=0))
    assert router.complete(AiChatRequest("q")).text == "answer"
    assert primary.call_count == 1


def test_backoff_schedule_exponential_capped():
    sleeps = []
    primary = ScriptedChatClient(
        "primary",
        [AiRateLimitError("1"), AiRateLimitError("2"), AiRateLimitError("3"), AiRateLimitError("4")],
    )
    fallback = ScriptedChatClient("fallback", [FALLBACK_OK])
    options = AiRoutingOptions(
        max_attempts_per_provider=4, retry_base_delay_ms=500, retry_max_delay_ms=1500
    )
    router = AiChatRouter(primary, fallback, options, sleep=sleeps.append)
    router.complete(AiChatRequest("q"))
    # 500ms, 1000ms, then capped at 1500ms
    assert sleeps == [0.5, 1.0, 1.5]
