"""Eval harness tests against the full in-process app."""

from omni_recall_tpu.chat.router import AiChatRouter, AiRateLimitError
from omni_recall_tpu.config import load_config
from omni_recall_tpu.contracts import AiChatResponse
from omni_recall_tpu.eval.clients import InProcessClient
from omni_recall_tpu.eval.harness import (
    EvalCase,
    EvalHarness,
    build_batch_prompt,
    generate_cases,
    to_topic,
)
from omni_recall_tpu.ingest.embedding import EmbeddingResult, EmbeddingStatus, FakeEmbeddingClient
from omni_recall_tpu.server.app import build_app


class ScriptedClient:
    def __init__(self, name, steps, default=None):
        self.provider_name = name
        self.steps = list(steps)
        self.default = default

    def complete(self, request):
        if self.steps:
            step = self.steps.pop(0)
        elif self.default is not None:
            step = self.default
        else:
            raise AiRateLimitError("exhausted")
        if isinstance(step, Exception):
            raise step
        return step


def _app(chat_default=None):
    config = load_config(
        settings_file=None, env={},
        overrides={
            "Engine:EmbeddingDim": 8, "Engine:CapacityBlock": 128,
            "AiRouting:MaxAttemptsPerProvider": 1, "AiRouting:RetryBaseDelayMs": 0,
        },
    )
    router = AiChatRouter(
        ScriptedClient("primary", [], default=chat_default),
        ScriptedClient("fallback", []),
        config.ai_routing, sleep=lambda s: None,
    )
    app = build_app(
        config,
        chat_router=router,
        embedding_client=FakeEmbeddingClient(
            default=EmbeddingResult([1.0] + [0.0] * 7, EmbeddingStatus.SUCCESS)
        ),
    )
    return app


def test_full_eval_run_pass_and_summary():
    app = _app(chat_default=AiChatResponse("answer citing [1]", "m", "primary"))
    app.ingestion_service.ingest("alpha.txt", "alpha document about gardens and plants", "file")
    app.ingestion_service.ingest("beta.txt", "beta memo about finance and budgets", "file")
    client = InProcessClient(app)

    cases = [
        EvalCase("gardens and plants", "alpha.txt"),
        EvalCase("finance and budgets", "beta.txt"),
        EvalCase("finance and budgets", "MISSING.txt"),
    ]
    report = EvalHarness(client).run(cases)
    summary = report["summary"]
    assert summary["cases"] == 3
    assert summary["recall_hit_rate"] == 2 / 3
    statuses = {r["case_id"]: r["status"] for r in report["results"]}
    assert list(statuses.values()).count("pass") == 2
    assert list(statuses.values()).count("fail") == 1


def test_eval_partial_when_chat_unavailable():
    app = _app(chat_default=AiRateLimitError("down"))
    # fallback disabled by code default -> /api/chat returns 503
    app.ingestion_service.ingest("alpha.txt", "alpha document about gardens", "file")
    client = InProcessClient(app)
    report = EvalHarness(client).run([EvalCase("gardens", "alpha.txt")])
    result = report["results"][0]
    assert result["status"] == "partial"
    assert result["recall_hit"] is True
    assert "unavailable" in result["detail"].lower() or "Chat" in result["detail"]


def test_eval_guard_blocks_count_as_fail():
    app = _app(chat_default=AiChatResponse("x", "m", "primary"))
    client = InProcessClient(app)
    # no documents -> recall returns nothing -> guard blocks chat
    report = EvalHarness(client).run([EvalCase("anything", "missing.txt")])
    result = report["results"][0]
    assert result["status"] == "fail"
    assert result["chat_hit"] is False


def test_generate_cases_from_documents():
    app = _app(chat_default=AiChatResponse("x", "m", "primary"))
    app.ingestion_service.ingest(
        "doc.txt",
        "This is the first sentence about solar panels. " * 5,
        "file",
    )
    client = InProcessClient(app)
    cases = generate_cases(client)
    assert cases
    assert all(c.expected_file == "doc.txt" for c in cases)
    assert any("solar panels" in c.question for c in cases)


def test_batch_prompt_format():
    prompt = build_batch_prompt([EvalCase("Q one?", "f"), EvalCase("Q two?", "f")])
    assert "1. Q one?" in prompt and "2. Q two?" in prompt
    assert prompt.startswith("Answer each numbered question")


def test_to_topic_first_sentence_first_8_words():
    assert to_topic("One two three four five six seven eight nine. Rest.") == \
        "One two three four five six seven eight"
    assert to_topic("   ") == "the first section"
