"""Ingestion service tests (behavioral mirror of DocumentIngestionServiceTests)."""

import threading
import time

import pytest

from omni_recall_tpu.config import EngineOptions, IngestionOptions
from omni_recall_tpu.index.store import InMemoryIngestionStore, InMemoryRawDocumentStore
from omni_recall_tpu.ingest.embedding import (
    EmbeddingResult,
    EmbeddingStatus,
    FakeEmbeddingClient,
)
from omni_recall_tpu.ingest.service import DocumentIngestionService, IngestionError
from omni_recall_tpu.search.engine import RecallEngine


def _service(store=None, client=None, options=None, engine=None):
    store = store or InMemoryIngestionStore()
    return store, DocumentIngestionService(
        store,
        InMemoryRawDocumentStore(),
        client or FakeEmbeddingClient(),
        options or IngestionOptions(chunk_size_words=5, chunk_overlap_words=1),
        engine=engine,
    )


def test_ingest_chunks_embeds_and_persists():
    client = FakeEmbeddingClient()
    store, svc = _service(client=client)
    result = svc.ingest("notes.txt", "one two three four five six seven eight", "file")
    assert result.document_id.startswith("doc_")
    assert result.chunk_count == 2
    assert len(result.content_hash) == 64
    chunks = store.get_chunks_by_document_id(result.document_id)
    assert [c.chunk_index for c in chunks] == [0, 1]
    assert chunks[0].id == f"{result.document_id}:0000"
    assert client.calls  # embeddings were requested


def test_ingest_normalizes_crlf_and_dedupes_by_hash():
    client = FakeEmbeddingClient()
    store, svc = _service(client=client)
    first = svc.ingest("a.txt", "hello world\r\nsecond line", "file")
    calls_after_first = len(client.calls)
    second = svc.ingest("b.txt", "hello world\nsecond line", "file")
    assert second.document_id == first.document_id
    assert second.file_name == first.file_name  # existing doc returned as-is
    assert len(client.calls) == calls_after_first  # NO re-embedding on dedupe
    assert len(store.list_documents(10)) == 1


def test_ingest_validates_inputs():
    _, svc = _service()
    with pytest.raises(IngestionError):
        svc.ingest("", "content", "file")
    with pytest.raises(IngestionError):
        svc.ingest("a.txt", "   ", "file")


def test_embedding_failure_never_aborts_ingest():
    class ThrowingClient:
        def embed(self, text):
            raise RuntimeError("boom")

    store, svc = _service(client=ThrowingClient())
    result = svc.ingest("a.txt", "words " * 20, "file")
    chunks = store.get_chunks_by_document_id(result.document_id)
    assert len(chunks) == result.chunk_count
    assert all(c.embedding is None for c in chunks)


def test_embedding_parallelism_clamped():
    max_seen = 0
    current = 0
    lock = threading.Lock()

    class TrackingClient:
        def embed(self, text):
            nonlocal max_seen, current
            with lock:
                current += 1
                max_seen = max(max_seen, current)
            time.sleep(0.005)
            with lock:
                current -= 1
            return EmbeddingResult([1.0], EmbeddingStatus.SUCCESS)

    _, svc = _service(
        client=TrackingClient(),
        options=IngestionOptions(chunk_size_words=2, chunk_overlap_words=0, embedding_parallelism=100),
    )
    svc.ingest("a.txt", "w " * 64, "file")
    assert max_seen <= 8  # clamp(parallelism, 1, 8)


def test_reindex_counters_and_vector_retention():
    store, svc = _service(
        client=FakeEmbeddingClient(default=EmbeddingResult([1.0, 0.0], EmbeddingStatus.SUCCESS)),
        options=IngestionOptions(chunk_size_words=2, chunk_overlap_words=0),
    )
    result = svc.ingest("a.txt", "a b c d e f g h", "file")
    old = {c.id: c.embedding for c in store.get_chunks_by_document_id(result.document_id)}

    # reindex with mixed outcomes: success, rate-limited, error, empty
    svc.embedding_client = FakeEmbeddingClient(
        results=[
            EmbeddingResult([9.0, 9.0], EmbeddingStatus.SUCCESS),
            EmbeddingResult([], EmbeddingStatus.RATE_LIMITED),
            EmbeddingResult([], EmbeddingStatus.ERROR),
            EmbeddingResult([], EmbeddingStatus.EMPTY),
        ],
        default=EmbeddingResult([], EmbeddingStatus.EMPTY),
    )
    svc.options = IngestionOptions(embedding_parallelism=1)  # keep scripted order
    reindexed = svc.reindex_document(result.document_id)
    assert reindexed.chunk_count == 4
    assert reindexed.embedded_count == 1
    assert reindexed.rate_limited_count == 1
    assert reindexed.failed_count == 1
    assert reindexed.empty_count == 1
    chunks = {c.id: c for c in store.get_chunks_by_document_id(result.document_id)}
    first_id = f"{result.document_id}:0000"
    assert chunks[first_id].embedding == [9.0, 9.0]
    for cid, c in chunks.items():
        if cid != first_id:
            assert c.embedding == old[cid]  # old vector kept on failure


def test_reindex_missing_document_returns_none():
    _, svc = _service()
    assert svc.reindex_document("doc_missing") is None


def test_delete_document():
    store, svc = _service()
    result = svc.ingest("a.txt", "alpha beta gamma delta epsilon zeta", "file")
    assert svc.delete_document(result.document_id) is True
    assert svc.delete_document(result.document_id) is False
    assert store.get_document(result.document_id) is None


def test_chunk_previews():
    store, svc = _service(options=IngestionOptions(chunk_size_words=3, chunk_overlap_words=0))
    result = svc.ingest("a.txt", " ".join(f"w{i}" for i in range(9)), "file")
    previews = svc.get_document_chunks(result.document_id, 2)
    assert len(previews) == 2
    assert previews[0].chunk_index == 0
    assert previews[0].has_embedding is True


def test_ingest_keeps_device_index_in_sync():
    store = InMemoryIngestionStore()
    engine = RecallEngine(store, options=EngineOptions(backend="xla", embedding_dim=2, capacity_block=128))
    client = FakeEmbeddingClient(default=EmbeddingResult([1.0, 0.0], EmbeddingStatus.SUCCESS))
    svc = DocumentIngestionService(
        store, InMemoryRawDocumentStore(), client,
        IngestionOptions(chunk_size_words=3, chunk_overlap_words=0), engine=engine,
    )
    result = svc.ingest("a.txt", "hello world again and again and more", "file")
    assert engine.device_index.n_valid == result.chunk_count
    svc.delete_document(result.document_id)
    assert engine.device_index.n_valid == 0
