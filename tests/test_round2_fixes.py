"""Regression tests for the round-2 advisor/verdict fixes.

Covers: certificate soundness under embedding-dim mismatch (ADVICE high),
rebuild-vs-ingest serialization (ADVICE medium), coalesced-batch 'now'
isolation (ADVICE low), topK validation -> 400 (ADVICE low), and the O(1)
window/delete index structures (VERDICT weak #4).
"""

import threading
from datetime import datetime, timedelta, timezone

import numpy as np
import pytest

from omni_recall_tpu.config import EngineOptions
from omni_recall_tpu.index.device_index import VALID_BLOCK, DeviceIndex
from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord
from omni_recall_tpu.index.store import InMemoryIngestionStore
from omni_recall_tpu.models import hash_embedder
from omni_recall_tpu.search.engine import RecallEngine

T0 = datetime(2026, 8, 1, tzinfo=timezone.utc)
NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)
DIM = 32


def _mk_engine(n=24, dim=DIM, **opt_kw):
    store = InMemoryIngestionStore()
    opts = EngineOptions(
        backend="xla", embedding_dim=dim, recent_window=300, candidate_m=8,
        capacity_block=128, bloom_bits=128, **opt_kw,
    )
    engine = RecallEngine(store, options=opts)
    store.upsert_document(DocumentRecord(id="d", file_name="d.txt", created_at_utc=T0))
    chunks = [
        ChunkRecord(
            id=f"d:{i:04d}", document_id="d", chunk_index=i,
            content=f"chunk number {i} about recall",
            embedding=hash_embedder.embed_text(f"chunk {i}", dim),
            created_at_utc=T0 + timedelta(minutes=i),
        )
        for i in range(n)
    ]
    store.upsert_chunks(chunks)
    engine.on_chunks_upserted(chunks, new=True)
    return store, engine, chunks


# ---- ADVICE high: dim-mismatched query embedding must stay exact ----

def test_dim_mismatched_query_embedding_routes_to_exact_host_scan():
    """A query embedding whose dim differs from the index dim must still be
    scored exactly against chunks that DO match the query's dim (reference
    semantics: CosineSimilarity only zeroes on per-pair mismatch,
    RecallSearchService.cs:70-71). The device path would report a 0 cosine
    upper bound for every row — unsound — so the engine must route the query
    to the exact host scan."""
    store, engine, chunks = _mk_engine(n=12, dim=DIM)
    # some chunks carry 48-dim embeddings (e.g. provider changed dims):
    # they land as zero rows on device but keep their raw embedding in meta
    odd = []
    for i in range(12, 18):
        odd.append(
            ChunkRecord(
                id=f"d:{i:04d}", document_id="d", chunk_index=i,
                content=f"odd dim chunk {i}",
                embedding=hash_embedder.embed_text(f"odd {i}", 48),
                created_at_utc=T0 + timedelta(minutes=i),
            )
        )
    store.upsert_chunks(odd)
    engine.on_chunks_upserted(odd, new=True)

    q48 = hash_embedder.embed_text("odd 15", 48)
    hits = engine.search("odd", q48, 3, now=NOW)

    oracle = RecallEngine(store, None, EngineOptions(backend="oracle", recent_window=300))
    expected = oracle.search("odd", q48, 3, now=NOW)
    assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]
    assert [h.score for h in hits] == pytest.approx([h.score for h in expected])
    # the true top hit has a REAL cosine contribution (dim-matching chunk)
    assert hits[0].chunk.id == "d:0015"


def test_zero_norm_query_embedding_still_exact():
    store, engine, _ = _mk_engine(n=8)
    hits = engine.search("chunk number 3", [0.0] * DIM, 2, now=NOW)
    oracle = RecallEngine(store, None, EngineOptions(backend="oracle", recent_window=300))
    expected = oracle.search("chunk number 3", [0.0] * DIM, 2, now=NOW)
    assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]


# ---- VERDICT weak #4: O(1)-amortized window + delete structures ----

def _naive_window_start(dix, window):
    if window <= 0 or dix.n_valid <= window:
        return 0
    count = 0
    for row in range(dix.n_rows - 1, -1, -1):
        if dix.valid[row]:
            count += 1
            if count == window:
                return row
    return 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_window_start_row_matches_naive_scan_under_deletes(seed):
    rng = np.random.default_rng(seed)
    n = VALID_BLOCK * 2 + 777  # span multiple valid-count blocks, ragged tail
    dix = DeviceIndex(4, capacity_block=128, bloom_bits=64)
    chunks = [
        ChunkRecord(
            id=f"x:{i}", document_id=f"doc{i % 37}", chunk_index=i,
            content="c", embedding=None,
            created_at_utc=T0 + timedelta(seconds=i),
        )
        for i in range(n)
    ]
    dix.append(chunks)
    # tombstone ~half the docs
    for d in rng.permutation(37)[:18]:
        dix.delete_document(f"doc{int(d)}")
    for window in (1, 5, 300, 1000, dix.n_valid - 1, dix.n_valid, dix.n_valid + 5, 0):
        assert dix.window_start_row(window) == _naive_window_start(dix, window), window


def test_delete_document_uses_row_map_and_counts():
    dix = DeviceIndex(4, capacity_block=128, bloom_bits=64)
    chunks = [
        ChunkRecord(
            id=f"x:{i}", document_id="a" if i % 2 else "b", chunk_index=i,
            content="c", embedding=None, created_at_utc=T0 + timedelta(seconds=i),
        )
        for i in range(10)
    ]
    dix.append(chunks)
    assert dix.delete_document("a") == 5
    assert dix.n_valid == 5
    assert dix.delete_document("a") == 0  # idempotent
    # appending to a deleted doc id again works (fresh rows)
    dix.append([
        ChunkRecord(id="x:99", document_id="a", chunk_index=0, content="c",
                    embedding=None, created_at_utc=T0 + timedelta(seconds=99))
    ])
    assert dix.delete_document("a") == 1
    assert dix.n_valid == 5


def test_window_start_row_fast_at_scale():
    """1M rows with 50% tombstones: the window computation must be
    sub-millisecond (was an O(n) python scan)."""
    import time

    n = 1 << 20
    dix = DeviceIndex(4, capacity_block=8192, bloom_bits=64)
    # synthesize state directly (append of 1M ChunkRecords is slow in a test)
    dix._ensure_capacity(n)
    dix.valid[:n] = np.arange(n) % 2 == 0
    dix._n = n
    dix._n_valid = n // 2
    nb = (n + VALID_BLOCK - 1) // VALID_BLOCK
    for b in range(nb):
        dix._block_valid[b] = int(np.count_nonzero(dix.valid[b * VALID_BLOCK:(b + 1) * VALID_BLOCK]))
    dix.window_start_row(300)  # warm
    t0 = time.perf_counter()
    r0 = dix.window_start_row(300)
    dt = time.perf_counter() - t0
    assert r0 == _naive_window_start(dix, 300)
    assert dt < 0.005, f"window_start_row took {dt * 1000:.2f} ms"


# ---- ADVICE medium: rebuild_index vs concurrent ingest ----

def test_rebuild_does_not_drop_concurrently_appended_chunks():
    store, engine, chunks = _mk_engine(n=16)

    start = threading.Barrier(2)
    done = threading.Event()

    def rebuild_loop():
        start.wait()
        for _ in range(20):
            engine.rebuild_index()
        done.set()

    appended = []

    def ingest_loop():
        start.wait()
        for i in range(100, 160):
            # each append is its own document: upsert_chunks REPLACES a
            # document's whole chunk list (reference semantics), so
            # incremental same-doc appends are not a legal store pattern —
            # the real ingest service always upserts a full document
            doc_id = f"late_{i}"
            c = ChunkRecord(
                id=f"{doc_id}:0000", document_id=doc_id, chunk_index=0,
                content=f"late chunk {i}",
                embedding=hash_embedder.embed_text(f"late {i}", DIM),
                created_at_utc=T0 + timedelta(minutes=i),
            )
            with engine.mutation_lock:
                store.upsert_document(DocumentRecord(
                    id=doc_id, file_name=f"{doc_id}.txt",
                    created_at_utc=c.created_at_utc,
                ))
                store.upsert_chunks([c])
                engine.on_chunks_upserted([c], new=True)
            appended.append(c.id)

    t1 = threading.Thread(target=rebuild_loop)
    t2 = threading.Thread(target=ingest_loop)
    t1.start(); t2.start()
    t1.join(); t2.join()
    assert done.is_set()
    live_ids = {c.id for c in engine.device_index.meta if c is not None}
    missing = [cid for cid in appended if cid not in live_ids]
    assert not missing, f"rebuild dropped {len(missing)} chunks: {missing[:5]}"


# ---- ADVICE low: coalesced batches must not share an explicit 'now' ----

def test_coalesce_partitions_by_explicit_now():
    from omni_recall_tpu.search.coalesce import CoalescingSearchExecutor

    store, engine, chunks = _mk_engine(n=8)
    ex = CoalescingSearchExecutor(engine, max_batch=8, window_ms=30.0)
    try:
        late_now = NOW + timedelta(days=3650)  # decays recency to ~0
        results = {}

        def go(name, now):
            results[name] = ex.search("chunk number 1", None, 1, now=now)

        threads = [
            threading.Thread(target=go, args=("fresh", NOW)),
            threading.Thread(target=go, args=("late", late_now)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        fresh_score = results["fresh"][0].score
        late_score = results["late"][0].score
        # identical query: the only difference is 'now'; scores must differ
        # (recency term) and each must equal its own direct search
        assert fresh_score == pytest.approx(
            engine.search("chunk number 1", None, 1, now=NOW)[0].score
        )
        assert late_score == pytest.approx(
            engine.search("chunk number 1", None, 1, now=late_now)[0].score
        )
        assert fresh_score > late_score
    finally:
        ex.close()


# ---- ADVICE low: non-integer topK -> 400, not 500 ----

def test_top_k_validation_returns_400():
    from omni_recall_tpu.config import AppConfig
    from omni_recall_tpu.server.app import OmniRecallApp
    from omni_recall_tpu.server.testing import TestClient

    config = AppConfig()
    config.engine.backend = "oracle"
    client = TestClient(OmniRecallApp(config))
    for bad in ("five", None, {"k": 5}, [5], True, 5.5):
        resp = client.post("/api/recall/search", json_body={"query": "x", "topK": bad})
        assert resp.status == 400, (bad, resp.status, resp.body)
    resp = client.post("/api/chat", json_body={"prompt": "x", "topK": "five"})
    assert resp.status == 400
    # lenient accepts: integral string/float (ASP.NET model binding style)
    resp = client.post("/api/recall/search", json_body={"query": "x", "topK": "3"})
    assert resp.status == 200
    resp = client.post("/api/recall/search", json_body={"query": "x", "topK": 3.0})
    assert resp.status == 200


# ---- self-review round-2 findings ----

def test_top_k_infinity_returns_400():
    from omni_recall_tpu.config import AppConfig
    from omni_recall_tpu.server.app import OmniRecallApp
    from omni_recall_tpu.server.testing import TestClient

    config = AppConfig()
    config.engine.backend = "oracle"
    client = TestClient(OmniRecallApp(config))
    resp = client.post("/api/recall/search", json_body={"query": "x", "topK": 1e999})
    assert resp.status == 400


def test_bulk_load_empty_arrays_is_noop():
    dix = DeviceIndex(4, capacity_block=128, bloom_bits=64)
    dix.bulk_load(
        np.zeros((0, 4), dtype=np.float32),
        np.zeros((0, 8), dtype=np.uint8),
        np.zeros((0,), dtype=np.float32),
        [],
    )
    assert dix.n_rows == 0 and dix.n_valid == 0
    assert dix.window_start_row(10) == 0


def test_coarse_gate_reopens_after_skip_horizon():
    from omni_recall_tpu.search.engine import RecallEngine as _RE

    engine = _RE(InMemoryIngestionStore(), None, EngineOptions(backend="oracle"))
    # simulate 32 failures -> gate closes
    engine._coarse_gate_record(0, 32)
    assert not engine._coarse_gate_open()
    horizon = engine._coarse_skip_until - engine._coarse_query_count
    # queries passing through a closed gate must advance the clock
    engine._coarse_query_count += horizon
    assert engine._coarse_gate_open(), "gate must re-probe after the horizon"


def test_rescore_uses_passed_index_snapshot_across_rebuild():
    """Row ids from a device scan refer to the scan-time index; a concurrent
    rebuild (which compacts tombstones and shifts rows) must not change what
    those ids dereference mid-search."""
    store, engine, chunks = _mk_engine(n=12)
    old = engine.device_index
    # delete a doc's rows and rebuild: the new index is compacted
    target_rows = np.asarray([3, 7, 11], dtype=np.int64)
    expected = engine._exact_rescore_rows(
        [("chunk", None)], [target_rows], NOW, dix=old
    )
    engine.rebuild_index()
    assert engine.device_index is not old
    got = engine._exact_rescore_rows(
        [("chunk", None)], [target_rows], NOW, dix=old
    )
    assert np.array_equal(got[0][0], expected[0][0])
    assert np.array_equal(got[0][1], expected[0][1])


def test_gemini_fallback_model_does_not_get_output_dimensionality():
    import json as _json

    from omni_recall_tpu.config import GeminiOptions
    from omni_recall_tpu.ingest.embedding import (
        EmbeddingStatus, GeminiEmbeddingClient,
    )

    bodies = []

    def transport(method, url, headers, body, timeout):
        from omni_recall_tpu.ingest.embedding import SimpleHttpResponse

        bodies.append((url, _json.loads(body.decode())))
        if "gemini-embedding-001" in url:
            return SimpleHttpResponse(404, b"")
        return SimpleHttpResponse(
            200, _json.dumps({"embedding": {"values": [0.5]}}).encode()
        )

    client = GeminiEmbeddingClient(
        GeminiOptions(api_key="k"), transport, output_dim=768
    )
    result = client.embed("text")
    assert result.status == EmbeddingStatus.SUCCESS
    assert bodies[0][1].get("outputDimensionality") == 768
    assert "embedding-001" in bodies[1][0]
    assert "outputDimensionality" not in bodies[1][1]


def test_pdf_font_names_with_dots_and_plus():
    from tests.test_pdf_extract import _pdf, _stream_obj

    from omni_recall_tpu.extract.pdf import extract_pdf_text

    cmap = b"begincmap\n1 beginbfchar\n<0001> <0041>\nendbfchar\nendcmap"
    font = b"<< /Type /Font /Subtype /Type0 /ToUnicode 3 0 R >>"
    content = b"<< /Font << /F1.0 2 0 R >> >>\n" + _stream_obj(
        b"BT /F1.0 12 Tf <0001> Tj /ABCDEF+Arial-Bold 9 Tf (plain) Tj ET"
    )
    pdf = _pdf([content, font, _stream_obj(cmap)])
    assert extract_pdf_text(pdf) == "A\nplain"


def test_metrics_endpoint_exposes_engine_counters():
    from omni_recall_tpu.config import AppConfig
    from omni_recall_tpu.server.app import OmniRecallApp
    from omni_recall_tpu.server.testing import TestClient

    config = AppConfig()
    config.engine.backend = "xla"
    config.engine.embedding_dim = 8
    config.embeddings.provider = "Hash"
    config.embeddings.dim = 8
    app = OmniRecallApp(config)
    client = TestClient(app)
    client.upload(
        "/api/documents/upload", filename="m.txt",
        data=b"metrics are exported for production serving observability",
    )
    client.post("/api/recall/search", json_body={"query": "metrics", "topK": 2})
    resp = client.get("/metrics")
    assert resp.status == 200
    assert resp.headers["Content-Type"].startswith("text/plain")
    body = resp.body.decode()
    assert "omni_searches_total 1" in body
    assert "omni_index_rows 1" in body
    assert "omni_index_valid_rows 1" in body
