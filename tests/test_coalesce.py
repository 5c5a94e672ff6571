"""Coalescing search executor: concurrent callers share device passes and
get exactly their own results."""

import threading
from datetime import datetime, timedelta, timezone

from omni_recall_tpu.config import EngineOptions
from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord
from omni_recall_tpu.index.store import InMemoryIngestionStore
from omni_recall_tpu.models import hash_embedder
from omni_recall_tpu.search.coalesce import CoalescingSearchExecutor
from omni_recall_tpu.search.engine import RecallEngine

DIM = 16
T0 = datetime(2026, 8, 1, tzinfo=timezone.utc)
NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)


def _engine():
    store = InMemoryIngestionStore()
    engine = RecallEngine(
        store,
        options=EngineOptions(backend="xla", embedding_dim=DIM, capacity_block=128,
                              candidate_m=8, bloom_bits=128, recent_window=0),
    )
    store.upsert_document(DocumentRecord(id="d", file_name="d.txt", created_at_utc=T0))
    chunks = [
        ChunkRecord(id=f"d:{i:04d}", document_id="d", chunk_index=i,
                    content=f"topic{i % 7} content {i}",
                    embedding=hash_embedder.embed_text(f"topic{i % 7}", DIM),
                    created_at_utc=T0 + timedelta(minutes=i))
        for i in range(60)
    ]
    store.upsert_chunks(chunks)
    engine.on_chunks_upserted(chunks, new=True)
    return engine


def test_concurrent_searches_return_correct_per_query_results():
    engine = _engine()
    executor = CoalescingSearchExecutor(engine, max_batch=16, window_ms=20.0)
    results = {}
    errors = []

    def worker(i):
        try:
            q = f"topic{i % 7}"
            hits = executor.search(q, hash_embedder.embed_text(q, DIM), 5, now=NOW)
            results[i] = hits
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    executor.close()

    assert not errors
    assert len(results) == 12
    for i, hits in results.items():
        expected = engine.search(
            f"topic{i % 7}", hash_embedder.embed_text(f"topic{i % 7}", DIM), 5, now=NOW
        )
        assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]


def test_executor_propagates_engine_errors():
    """Failures in BOTH pipeline stages must reach the blocked caller:
    dispatch (device-batch prep/scan dispatch) and finalize (readback +
    rescore on the worker thread)."""
    class Boom(Exception):
        pass

    def boom(*a, **k):
        raise Boom("stage failed")

    for stage in ("_dispatch_device_batch", "_finalize_device_batch"):
        engine = _engine()
        setattr(engine, stage, boom)
        executor = CoalescingSearchExecutor(engine, window_ms=1.0)
        try:
            try:
                executor.search("q", [], 3)
                raised = False
            except Boom:
                raised = True
            assert raised, stage
        finally:
            executor.close()


def test_executor_propagates_errors_oracle_sync_path():
    """The oracle backend has no device stage; search_batch errors still
    propagate through the synchronous path."""
    store = InMemoryIngestionStore()
    engine = RecallEngine(
        store, options=EngineOptions(backend="oracle", recent_window=0)
    )

    class Boom(Exception):
        pass

    def broken_batch(requests, now=None):
        raise Boom("scan failed")

    engine.search_batch = broken_batch
    executor = CoalescingSearchExecutor(engine, window_ms=1.0)
    try:
        try:
            executor.search("q", [], 3)
            raised = False
        except Boom:
            raised = True
        assert raised
    finally:
        executor.close()


def test_closed_executor_rejects():
    engine = _engine()
    executor = CoalescingSearchExecutor(engine)
    executor.close()
    try:
        executor.search("q", [], 1)
        raised = False
    except RuntimeError:
        raised = True
    assert raised


def test_concurrent_ingest_and_search_threads():
    """Mutation (append/delete) racing searches must never crash or return
    torn results (DeviceIndex lock)."""
    import random
    from datetime import timedelta

    engine = _engine()
    store = engine.store
    errors = []
    stop = threading.Event()

    def ingester():
        rng = random.Random(5)
        i = 1000
        try:
            while not stop.is_set():
                doc_id = f"x{i}"
                store.upsert_document(
                    DocumentRecord(id=doc_id, file_name=f"{doc_id}.txt", created_at_utc=T0)
                )
                chunks = [
                    ChunkRecord(id=f"{doc_id}:0000", document_id=doc_id, chunk_index=0,
                                content=f"topic{i % 7} extra {i}",
                                embedding=hash_embedder.embed_text(f"topic{i % 7}", DIM),
                                created_at_utc=T0 + timedelta(days=1, seconds=i))
                ]
                store.upsert_chunks(chunks)
                engine.on_chunks_upserted(chunks, new=True)
                if i % 5 == 0:
                    store.delete_document(doc_id)
                    engine.on_document_deleted(doc_id)
                i += 1
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def searcher():
        try:
            for j in range(25):
                q = f"topic{j % 7}"
                hits = engine.search(q, hash_embedder.embed_text(q, DIM), 5, now=NOW)
                assert len(hits) <= 5
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    t_ing = threading.Thread(target=ingester)
    t_search = [threading.Thread(target=searcher) for _ in range(3)]
    t_ing.start()
    for t in t_search:
        t.start()
    for t in t_search:
        t.join()
    stop.set()
    t_ing.join()
    assert not errors


def test_flush_finalizes_inline_after_pool_shutdown():
    """If close() times out waiting for a blocked dispatcher and shuts the
    finalize pool down, a subsequent _flush must finalize INLINE instead of
    dying on submit() — accepted futures must always resolve."""
    from concurrent.futures import Future

    engine = _engine()
    executor = CoalescingSearchExecutor(engine, max_batch=4, window_ms=1.0)
    try:
        # simulate the close()-raced state: pool already shut down while a
        # batch is still being flushed by the dispatcher
        executor._finalize_pool.shutdown(wait=True)
        fut = Future()
        q = "topic1"
        executor._flush([((q, hash_embedder.embed_text(q, DIM), 5), NOW, fut)])
        hits = fut.result(timeout=10)
        expected = engine.search(q, hash_embedder.embed_text(q, DIM), 5, now=NOW)
        assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]
        # the in-flight permit was released by the inline finalize
        assert executor._inflight.acquire(blocking=False)
        executor._inflight.release()
    finally:
        executor.close()
