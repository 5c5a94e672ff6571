"""Provider client tests with scripted HTTP transports (reference pattern:
GeminiChatClientTests.cs / GitHubModelsChatClientTests.cs fake handlers)."""

import json

import pytest

from omni_recall_tpu.chat.providers import GeminiChatClient, GitHubModelsChatClient
from omni_recall_tpu.chat.router import AiRateLimitError, HttpRequestError
from omni_recall_tpu.config import GeminiOptions, GitHubModelsOptions
from omni_recall_tpu.contracts import AiChatRequest
from omni_recall_tpu.ingest.embedding import GeminiEmbeddingClient, SimpleHttpResponse
from omni_recall_tpu.ingest.embedding import EmbeddingStatus


class ScriptedTransport:
    def __init__(self, steps):
        self.steps = list(steps)
        self.urls = []

    def __call__(self, method, url, headers, body, timeout):
        self.urls.append(url)
        status, payload = self.steps.pop(0)
        if isinstance(payload, (dict, list)):
            payload = json.dumps(payload).encode()
        elif isinstance(payload, str):
            payload = payload.encode()
        return SimpleHttpResponse(status, payload)


def _gemini_ok(text="hello"):
    return {"candidates": [{"content": {"parts": [{"text": text}]}}]}


REQ = AiChatRequest("prompt")


# -- Gemini chat --

def test_gemini_success_first_model():
    t = ScriptedTransport([(200, _gemini_ok("answer"))])
    client = GeminiChatClient(GeminiOptions(api_key="k"), t)
    resp = client.complete(REQ)
    assert resp.text == "answer"
    assert resp.model == "gemini-2.5-flash"
    assert resp.provider == "gemini"
    assert "gemini-2.5-flash:generateContent" in t.urls[0]


def test_gemini_429_fails_over_model_chain():
    t = ScriptedTransport([(429, ""), (200, _gemini_ok("from fallback"))])
    client = GeminiChatClient(GeminiOptions(api_key="k"), t)
    resp = client.complete(REQ)
    assert resp.model == "gemini-2.5-flash-lite"
    assert len(t.urls) == 2


def test_gemini_all_models_rate_limited_raises_rate_limit():
    t = ScriptedTransport([(429, "")] * 5)
    client = GeminiChatClient(GeminiOptions(api_key="k"), t)
    with pytest.raises(AiRateLimitError):
        client.complete(REQ)
    assert len(t.urls) == 5  # primary + 4 default fallbacks


def test_gemini_404_fails_over_but_400_does_not():
    t = ScriptedTransport([(404, "no such model"), (200, _gemini_ok())])
    client = GeminiChatClient(GeminiOptions(api_key="k"), t)
    assert client.complete(REQ).text == "hello"

    t2 = ScriptedTransport([(400, "bad request body")])
    client2 = GeminiChatClient(GeminiOptions(api_key="k"), t2)
    with pytest.raises(HttpRequestError):
        client2.complete(REQ)
    assert len(t2.urls) == 1


def test_gemini_400_with_quota_body_fails_over():
    t = ScriptedTransport([(400, "quota exceeded for today"), (200, _gemini_ok())])
    client = GeminiChatClient(GeminiOptions(api_key="k"), t)
    assert client.complete(REQ).text == "hello"


def test_gemini_missing_text_raises_with_block_reason():
    t = ScriptedTransport([(200, {"promptFeedback": {"blockReason": "SAFETY"}})])
    client = GeminiChatClient(GeminiOptions(api_key="k"), t)
    with pytest.raises(RuntimeError, match="blockReason=SAFETY"):
        client.complete(REQ)


def test_gemini_model_chain_dedup_case_insensitive():
    options = GeminiOptions(
        api_key="k", model="gemini-2.5-flash",
        fallback_models=["GEMINI-2.5-FLASH", "custom-model"],
    )
    client = GeminiChatClient(options, ScriptedTransport([]))
    assert client._candidate_models() == ["gemini-2.5-flash", "custom-model"]


def test_gemini_requires_api_key():
    client = GeminiChatClient(GeminiOptions(api_key=""), ScriptedTransport([]))
    with pytest.raises(RuntimeError, match="not configured"):
        client.complete(REQ)


# -- GitHub Models --

def test_github_models_success_string_content():
    t = ScriptedTransport([(200, {"choices": [{"message": {"content": "hi"}}]})])
    client = GitHubModelsChatClient(GitHubModelsOptions(token="t"), t)
    resp = client.complete(REQ)
    assert resp.text == "hi"
    assert resp.provider == "github-models"
    assert resp.model == "deepseek/DeepSeek-V3-0324"


def test_github_models_array_content_concatenated():
    content = [{"text": "part one "}, "literal ", {"text": "part two"}, {"type": "x"}]
    t = ScriptedTransport([(200, {"choices": [{"message": {"content": content}}]})])
    client = GitHubModelsChatClient(GitHubModelsOptions(token="t"), t)
    assert client.complete(REQ).text == "part one literal part two"


def test_github_models_429_raises_rate_limit():
    t = ScriptedTransport([(429, "")])
    client = GitHubModelsChatClient(GitHubModelsOptions(token="t"), t)
    with pytest.raises(AiRateLimitError):
        client.complete(REQ)


def test_github_models_malformed_raises():
    t = ScriptedTransport([(200, {"unexpected": True})])
    client = GitHubModelsChatClient(GitHubModelsOptions(token="t"), t)
    with pytest.raises(RuntimeError, match="Top-level keys: unexpected"):
        client.complete(REQ)


# -- Gemini embeddings --

def test_embedding_success():
    t = ScriptedTransport([(200, {"embedding": {"values": [0.1, 0.2]}})])
    client = GeminiEmbeddingClient(GeminiOptions(api_key="k"), t)
    result = client.embed("text")
    assert result.status == EmbeddingStatus.SUCCESS
    assert result.vector == [0.1, 0.2]
    assert result.model == "gemini-embedding-001"


def test_embedding_429_is_rate_limited_not_exception():
    t = ScriptedTransport([(429, "")])
    client = GeminiEmbeddingClient(GeminiOptions(api_key="k"), t)
    assert client.embed("text").status == EmbeddingStatus.RATE_LIMITED


def test_embedding_404_tries_next_model():
    t = ScriptedTransport([(404, ""), (200, {"embedding": {"values": [1.0]}})])
    client = GeminiEmbeddingClient(GeminiOptions(api_key="k"), t)
    result = client.embed("text")
    assert result.status == EmbeddingStatus.SUCCESS
    assert result.model == "embedding-001"


def test_embedding_403_is_error():
    t = ScriptedTransport([(403, "")])
    client = GeminiEmbeddingClient(GeminiOptions(api_key="k"), t)
    result = client.embed("text")
    assert result.status == EmbeddingStatus.ERROR
    assert "Auth rejected: 403" == result.message  # GeminiEmbeddingClient.cs:60-64


def test_embedding_no_key_is_empty():
    """GeminiEmbeddingClient.cs:21-22: missing/whitespace key -> EMPTY
    locally, no network call (was NOT_SUPPORTED — a parity deviation)."""
    client = GeminiEmbeddingClient(GeminiOptions(api_key=""), ScriptedTransport([]))
    assert client.embed("x").status == EmbeddingStatus.EMPTY
    client = GeminiEmbeddingClient(GeminiOptions(api_key="  "), ScriptedTransport([]))
    assert client.embed("x").status == EmbeddingStatus.EMPTY
    # blank input text is also local EMPTY (:17-18)
    client = GeminiEmbeddingClient(GeminiOptions(api_key="k"), ScriptedTransport([]))
    assert client.embed("   ").status == EmbeddingStatus.EMPTY


def test_embedding_404_chain_exhaustion_not_supported():
    """All models 404 -> NOT_SUPPORTED 'No compatible...' (:99-100)."""
    t = ScriptedTransport([(404, "")] * 8)
    client = GeminiEmbeddingClient(GeminiOptions(api_key="k"), t)
    result = client.embed("text")
    assert result.status == EmbeddingStatus.NOT_SUPPORTED


def test_embedding_model_normalization():
    """NormalizeModel strips the 'models/' prefix; dedup is
    case-insensitive (:103-129)."""
    client = GeminiEmbeddingClient(
        GeminiOptions(api_key="k", embedding_model="models/Gemini-Embedding-001"),
        ScriptedTransport([]),
    )
    models = client._candidate_models()
    assert models[0] == "Gemini-Embedding-001"
    assert len([m for m in models if m.lower() == "gemini-embedding-001"]) == 1


def test_embedding_output_dimensionality_sent_when_configured():
    """Extension over the reference: Embeddings:Dim is forwarded as
    outputDimensionality so provider vectors match the device index dim
    (otherwise every query would take the dim-mismatch host fallback)."""
    import json as _json

    class CapturingTransport(ScriptedTransport):
        def __init__(self, steps):
            super().__init__(steps)
            self.bodies = []

        def __call__(self, method, url, headers, body, timeout):
            self.bodies.append(_json.loads(body.decode()))
            return super().__call__(method, url, headers, body, timeout)

    t = CapturingTransport([(200, {"embedding": {"values": [0.1]}})])
    client = GeminiEmbeddingClient(GeminiOptions(api_key="k"), t, output_dim=768)
    assert client.embed("text").status == EmbeddingStatus.SUCCESS
    assert t.bodies[0]["outputDimensionality"] == 768

    t2 = CapturingTransport([(200, {"embedding": {"values": [0.1]}})])
    client2 = GeminiEmbeddingClient(GeminiOptions(api_key="k"), t2)
    client2.embed("text")
    assert "outputDimensionality" not in t2.bodies[0]  # reference behavior
