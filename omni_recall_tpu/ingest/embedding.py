"""Embedding clients.

Mirrors the reference's embedding abstraction
(src/OmniRecall.Api/Services/IEmbeddingClient.cs:3-21): clients NEVER raise;
they return ``EmbeddingResult(vector, status, model, message)`` with status in
{success, empty, rate_limited, not_supported, error}.

- ``NoOpEmbeddingClient`` — the default when no provider is configured
  (NoOpEmbeddingClient.cs:9, Program.cs:50-57); search degrades to
  keyword+recency only.
- ``HashEmbeddingClient`` — NEW: local deterministic embedder
  (models/hash_embedder.py) for offline/bench operation.
- ``GeminiEmbeddingClient`` — HTTPS client with the reference's model-chain
  semantics (GeminiEmbeddingClient.cs:13-117): candidates = configured model +
  [gemini-embedding-001, embedding-001] deduped; 429 -> rate_limited;
  404 -> try next model; 401/403 -> error; parses ``embedding.values``.
  The HTTP transport is injectable so tests replay scripted responses, like
  the reference's fake HttpMessageHandlers (GeminiEmbeddingClientTests.cs).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from enum import Enum
from typing import Callable, Protocol

from omni_recall_tpu.config import GeminiOptions
from omni_recall_tpu.models import hash_embedder


class EmbeddingStatus(str, Enum):
    SUCCESS = "success"
    EMPTY = "empty"
    RATE_LIMITED = "rate_limited"
    NOT_SUPPORTED = "not_supported"
    ERROR = "error"


@dataclass(frozen=True)
class EmbeddingResult:
    vector: list[float]
    status: EmbeddingStatus
    model: str | None = None
    message: str | None = None


class HttpResponse(Protocol):
    status: int
    body: bytes


@dataclass
class SimpleHttpResponse:
    status: int
    body: bytes
    headers: dict[str, str] = None  # lower-cased keys

    def __post_init__(self) -> None:
        if self.headers is None:
            self.headers = {}


Transport = Callable[[str, str, dict[str, str], bytes | None, float], SimpleHttpResponse]


def urllib_transport(
    method: str, url: str, headers: dict[str, str], body: bytes | None, timeout: float
) -> SimpleHttpResponse:
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return SimpleHttpResponse(
                resp.status, resp.read(),
                {k.lower(): v for k, v in resp.headers.items()},
            )
    except urllib.error.HTTPError as exc:
        return SimpleHttpResponse(
            exc.code, exc.read(), {k.lower(): v for k, v in (exc.headers or {}).items()}
        )


class NoOpEmbeddingClient:
    def embed(self, text: str) -> EmbeddingResult:
        return EmbeddingResult([], EmbeddingStatus.EMPTY, model="none")


class HashEmbeddingClient:
    def __init__(self, dim: int = 768) -> None:
        self.dim = dim

    def embed(self, text: str) -> EmbeddingResult:
        vec = hash_embedder.embed_text(text, self.dim)
        if not vec:
            return EmbeddingResult([], EmbeddingStatus.EMPTY, model="hash")
        return EmbeddingResult(vec, EmbeddingStatus.SUCCESS, model="hash")


class LocalEncoderEmbeddingClient:
    """On-device transformer embedder (models/encoder.py) as an embedding
    provider: the framework runs fully self-contained — ingestion and query
    embeddings computed on the TPU, no network dependency. NEW vs the
    reference, whose embeddings are all remote HTTPS
    (GeminiEmbeddingClient.cs); selected with Embeddings:Provider=Local.

    Batches are padded to power-of-two sizes so jit recompiles are bounded
    (one compile per bucket); a fine-tuned checkpoint (models/encoder.py
    save_params, e.g. from tools/train_embedder_demo.py) is loaded when
    Embeddings:Checkpoint is set, otherwise deterministic seed-0 init."""

    _BUCKETS = (1, 8, 32, 128)

    def __init__(
        self, dim: int = 768, checkpoint: str = "", seed: int = 0, cfg=None
    ) -> None:
        import jax
        from functools import partial as _partial

        from omni_recall_tpu.models import encoder

        self._enc = encoder
        if checkpoint:
            self.params, self.cfg = encoder.load_params(checkpoint)
            if self.cfg.out_dim != dim:
                raise ValueError(
                    f"checkpoint out_dim {self.cfg.out_dim} != Embeddings:Dim {dim}"
                )
            self.model = f"local-encoder:{checkpoint}"
        else:
            self.cfg = cfg or encoder.EncoderConfig(out_dim=dim)
            self.params = encoder.init_params(jax.random.PRNGKey(seed), self.cfg)
            self.model = "local-encoder"
        self._forward = jax.jit(_partial(encoder.forward, cfg=self.cfg))

    def _embed_many(self, texts: list[str]) -> list[EmbeddingResult]:
        import numpy as np

        nonempty = [i for i, t in enumerate(texts) if t.strip()]
        out: list[EmbeddingResult] = [
            EmbeddingResult([], EmbeddingStatus.EMPTY, model=self.model)
            for _ in texts
        ]
        if not nonempty:
            return out
        try:
            ids = self._enc.tokenize_batch([texts[i] for i in nonempty], self.cfg)
            bucket = next(
                (b for b in self._BUCKETS if b >= len(nonempty)),
                ((len(nonempty) + 127) // 128) * 128,
            )
            if bucket > len(nonempty):
                ids = np.concatenate(
                    [ids, np.zeros((bucket - len(nonempty), ids.shape[1]), ids.dtype)]
                )
            vecs = np.asarray(self._forward(self.params, ids))
            for row, i in enumerate(nonempty):
                out[i] = EmbeddingResult(
                    [float(v) for v in vecs[row]], EmbeddingStatus.SUCCESS,
                    model=self.model,
                )
        except Exception as exc:  # never raise (IEmbeddingClient.cs contract)
            for i in nonempty:
                out[i] = EmbeddingResult(
                    [], EmbeddingStatus.ERROR, model=self.model, message=str(exc)
                )
        return out

    def embed(self, text: str) -> EmbeddingResult:
        return self._embed_many([text])[0]

    def embed_batch(self, texts: list[str]) -> list[EmbeddingResult]:
        """One device pass for a whole chunk batch — the ingestion service
        prefers this over bounded-parallel single calls when present."""
        return self._embed_many(texts)

    @property
    def dim(self) -> int:
        return self.cfg.out_dim

    def swap_params(self, params, tag: str = "trained") -> None:
        """Hot-swap the encoder checkpoint (POST /api/documents/train):
        ``params`` must match the current cfg (same pytree shapes — the
        train route fine-tunes with this client's own cfg, so that holds by
        construction). The jitted forward takes params as an argument, so
        the swap is one reference assignment; in-flight embeds finish on
        the old params, later calls (including the engine's attached
        device-query pipeline, which reads ``self.params`` per dispatch)
        use the new ones. Callers re-embed the index afterwards (reindex
        semantics) so stored rows and queries agree."""
        self.params = params
        self.model = f"local-encoder:{tag}"

    def embed_device(self, texts: list[str]):
        """Device-resident query embeddings: forward the batch and return
        the f32[len(texts), out_dim] rows as a DEVICE array — no host
        readback, no per-query vector upload. The engine chains this
        straight into the scan dispatch (search/engine.py device-query
        pipeline) and materializes host copies lazily (only for the rare
        certificate escalations).

        Shapes are bucketed (batch to the next power of two, token length
        to the next power-of-two >= the batch's longest query, capped at
        cfg.max_len) so jit compiles stay bounded. Padding positions are
        masked in the forward, so the embedding VALUES are
        length-independent; the f32 BITS may differ between bucket shapes
        (XLA fusion/layout), which is fine — the engine's exactness
        certificates are relative to the materialized bits of THIS forward,
        mirroring the reference, whose remote embeddings carry no
        cross-call bit guarantee at all (GeminiEmbeddingClient.cs)."""
        import numpy as np

        assert texts, "embed_device requires a non-empty batch"
        b = len(texts)
        ids_full = self._enc.tokenize_batch(texts, self.cfg)
        n_tok = int((ids_full > 0).sum(axis=1).max()) if b else 0
        l_bucket = 16
        while l_bucket < min(max(n_tok, 1), self.cfg.max_len):
            l_bucket *= 2
        l_bucket = min(l_bucket, self.cfg.max_len)
        ids = ids_full[:, :l_bucket]
        b_bucket = next(
            (bb for bb in self._BUCKETS if bb >= b),
            ((b + 127) // 128) * 128,
        )
        if b_bucket > b:
            ids = np.concatenate(
                [ids, np.zeros((b_bucket - b, l_bucket), ids.dtype)]
            )
        return self._forward(self.params, ids)[:b]


class FakeEmbeddingClient:
    """Scripted test double (reference pattern:
    DocumentIngestionServiceTests.cs FakeEmbeddingClient)."""

    def __init__(self, results: list[EmbeddingResult] | None = None, default: EmbeddingResult | None = None):
        self.results = list(results or [])
        self.default = default or EmbeddingResult([1.0, 0.0], EmbeddingStatus.SUCCESS, model="fake")
        self.calls: list[str] = []

    def embed(self, text: str) -> EmbeddingResult:
        self.calls.append(text)
        if self.results:
            return self.results.pop(0)
        return self.default


_DEFAULT_MODEL_CHAIN = ["gemini-embedding-001", "embedding-001"]

# models that predate the outputDimensionality request field
_NO_OUTPUT_DIM_MODELS = {"embedding-001"}


class GeminiEmbeddingClient:
    """Gemini embedContent client (GeminiEmbeddingClient.cs:15-99 semantics).

    Extension over the reference: when ``output_dim`` is set (wired from
    Embeddings:Dim), the request carries ``outputDimensionality`` so the
    provider returns vectors matching the device index dim — the reference
    omits it, and gemini-embedding-001's 3072-dim default would silently
    route every query to the exact host scan (dim-mismatch soundness
    fallback, search/engine.py)."""

    def __init__(
        self,
        options: GeminiOptions,
        transport: Transport | None = None,
        timeout: float = 30.0,
        output_dim: int | None = None,
    ):
        self.options = options
        self.transport = transport or urllib_transport
        self.timeout = timeout
        self.output_dim = output_dim

    def _candidate_models(self) -> list[str]:
        """BuildModelCandidates parity (GeminiEmbeddingClient.cs:103-129):
        configured model is trimmed and its 'models/' prefix stripped
        (NormalizeModel), and the default chain dedupes case-insensitively."""
        configured = (self.options.embedding_model or "").strip()
        if configured.lower().startswith("models/"):
            configured = configured[len("models/"):]
        chain = ([configured] if configured else []) + _DEFAULT_MODEL_CHAIN
        out: list[str] = []
        seen: set[str] = set()
        for model in chain:
            if model.lower() not in seen:
                seen.add(model.lower())
                out.append(model)
        return out

    def embed(self, text: str) -> EmbeddingResult:
        import urllib.parse

        # GeminiEmbeddingClient.cs:17-22: local EMPTY (no network call) for
        # blank input or a missing/whitespace API key
        if not text or not text.strip():
            return EmbeddingResult(
                [], EmbeddingStatus.EMPTY, message="Input text is empty."
            )
        if not self.options.api_key or not self.options.api_key.strip():
            return EmbeddingResult(
                [], EmbeddingStatus.EMPTY, message="Gemini API key missing."
            )
        for model in self._candidate_models():
            body: dict = {
                "model": f"models/{model}",
                "content": {"parts": [{"text": text}]},
            }
            # extension: legacy models reject the field; send only where supported
            if self.output_dim and model not in _NO_OUTPUT_DIM_MODELS:
                body["outputDimensionality"] = self.output_dim
            payload = json.dumps(body).encode("utf-8")
            key = urllib.parse.quote(self.options.api_key, safe="")  # Uri.EscapeDataString
            url = f"{self.options.base_url}/models/{model}:embedContent?key={key}"
            try:
                resp = self.transport(
                    "POST", url, {"Content-Type": "application/json"}, payload, self.timeout
                )
            except Exception:  # transport failure: try next model (:93-96)
                continue
            if resp.status == 429:
                return EmbeddingResult(
                    [], EmbeddingStatus.RATE_LIMITED, model=model, message="Rate limited."
                )
            if resp.status == 404:
                continue  # model unavailable: try next (:54-58)
            if resp.status in (401, 403):
                return EmbeddingResult(
                    [], EmbeddingStatus.ERROR, model=model,
                    message=f"Auth rejected: {resp.status}",
                )
            if resp.status >= 400:
                # any other failure stops the chain (:66-74)
                return EmbeddingResult(
                    [], EmbeddingStatus.ERROR, model=model, message=f"HTTP {resp.status}"
                )
            try:
                data = json.loads(resp.body.decode("utf-8"))
            except ValueError:
                # DELIBERATE DEVIATION from GeminiEmbeddingClient.cs:84-86:
                # the reference's JsonDocument.Parse exception on a malformed
                # 200 body is NOT caught by its HttpRequestException/
                # TaskCanceledException filter and would propagate; this
                # client keeps the never-raise contract and treats it like a
                # transport failure (continue down the model chain)
                continue
            embedding = data.get("embedding") if isinstance(data, dict) else None
            if not isinstance(embedding, dict):
                return EmbeddingResult(
                    [], EmbeddingStatus.EMPTY, model=model,
                    message="Missing embedding property.",
                )
            values = embedding.get("values")
            if not isinstance(values, list):
                return EmbeddingResult(
                    [], EmbeddingStatus.EMPTY, model=model,
                    message="Missing embedding values.",
                )
            floats = []
            for v in values:
                try:
                    floats.append(float(v))
                except (TypeError, ValueError):
                    pass  # TryGetSingle parity: skip non-numeric entries
            status = EmbeddingStatus.SUCCESS if floats else EmbeddingStatus.EMPTY
            return EmbeddingResult(floats, status, model=model)
        # chain exhausted (:99-100)
        return EmbeddingResult(
            [], EmbeddingStatus.NOT_SUPPORTED,
            message="No compatible Gemini embedding model.",
        )
