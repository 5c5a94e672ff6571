"""Device-resident query pipeline (engine.attach_device_embedder).

With the local on-device encoder attached, requests arriving WITHOUT an
embedding are embedded on device inside the search dispatch: the raw query
matrix never crosses the host boundary on certified queries (only the 8-byte
double-float self-norms come back), and certificate escalations materialize
the exact rows lazily. The exactness contract is relative to the
MATERIALIZED bits of the device forward — the canonical query embedding —
so the oracle comparison feeds those same bits.
"""

import random
import string
from datetime import datetime, timedelta, timezone

import numpy as np
import pytest

from omni_recall_tpu.config import EngineOptions
from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord
from omni_recall_tpu.index.store import InMemoryIngestionStore
from omni_recall_tpu.ingest.embedding import LocalEncoderEmbeddingClient
from omni_recall_tpu.models import hash_embedder
from omni_recall_tpu.models.encoder import EncoderConfig
from omni_recall_tpu.search.engine import RecallEngine

DIM = 32
T0 = datetime(2026, 8, 1, tzinfo=timezone.utc)
NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)

_CFG = EncoderConfig(
    vocab_size=512, d_model=32, n_layers=1, n_heads=2, d_ff=64,
    max_len=32, out_dim=DIM,
)


def _client() -> LocalEncoderEmbeddingClient:
    return LocalEncoderEmbeddingClient(dim=DIM, cfg=_CFG)


def _build(rng, n=240, dup_pairs=0, dd=True):
    store = InMemoryIngestionStore()
    engine = RecallEngine(
        store,
        options=EngineOptions(
            backend="pallas", scan_dtype="int8", embedding_dim=DIM,
            capacity_block=128, candidate_m=16, bloom_bits=256,
            recent_window=0, device_exact_cos=dd,
        ),
    )
    client = _client()
    engine.attach_device_embedder(client)
    oracle_engine = RecallEngine(
        store, None, EngineOptions(backend="oracle", recent_window=0)
    )
    vocab = [
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 8)))
        for _ in range(40)
    ]
    store.upsert_document(
        DocumentRecord(id="d", file_name="d.txt", created_at_utc=T0)
    )
    # distinct random unit rows: hash_embedder at DIM=32 collides heavily
    # (bitwise-equal rows), which makes every query's kth an exact tie and
    # — correctly — escalates everything to the host scan; that degenerate
    # regime is covered by dup_pairs below, not the base corpus
    nrng = np.random.default_rng(97)
    chunks = []
    for i in range(n):
        content = " ".join(rng.choices(vocab, k=rng.randint(4, 15)))
        emb = nrng.standard_normal(DIM).astype(np.float32)
        emb /= np.linalg.norm(emb)
        chunks.append(
            ChunkRecord(
                id=f"d:{i:04d}", document_id="d", chunk_index=i,
                content=content, embedding=emb,
                created_at_utc=T0 + timedelta(minutes=i),
            )
        )
    # bitwise-duplicate rows: exactly tied oracle scores for ANY query ->
    # the DD margin cannot separate them -> escalation (which must
    # materialize the device-embedded query rows for the host rescore)
    for j in range(dup_pairs):
        src = chunks[j]
        chunks.append(
            ChunkRecord(
                id=f"d:dup{j:02d}", document_id="d",
                chunk_index=n + j, content=src.content,
                embedding=src.embedding, created_at_utc=src.created_at_utc,
            )
        )
    store.upsert_chunks(chunks)
    engine.on_chunks_upserted(chunks, new=True)
    return engine, oracle_engine, client, vocab, chunks


def _canonical_embeddings(client, queries):
    """The canonical device-forward bits for an all-device-embedded batch:
    the engine calls embed_device on exactly this text list, so calling it
    again hits the same compiled executable and returns the same f32 bits."""
    rows = np.asarray(client.embed_device(queries))
    return {q: rows[i] for i, q in enumerate(queries)}


def _assert_oracle_match(engine, oracle_engine, client, requests):
    """requests carry no embeddings; the oracle gets the materialized
    canonical bits for each device-embedded query."""
    texts = [q for q, emb, _ in requests if emb is None and q.strip()]
    canon = _canonical_embeddings(client, texts) if texts else {}
    batch = engine.search_batch(requests, now=NOW)
    for (query, emb, k), hits in zip(requests, batch):
        if emb is None and query.strip():
            emb = [float(v) for v in canon[query]]
        expected = oracle_engine.search(query, emb, k, now=NOW)
        assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]
        for h, e in zip(hits, expected):
            assert round(h.score, 4) == round(e.score, 4)
            assert abs(h.score - e.score) < 1e-8


def test_device_query_matches_oracle_on_canonical_bits():
    rng = random.Random(23)
    engine, oracle_engine, client, vocab, _ = _build(rng)
    queries = list(dict.fromkeys(
        " ".join(rng.choices(vocab, k=rng.randint(1, 3))) for _ in range(10)
    ))
    requests = [(q, None, rng.choice([1, 3, 10])) for q in queries]
    _assert_oracle_match(engine, oracle_engine, client, requests)
    assert engine.stats["dd_resolved_total"] > 0


def test_device_query_mixed_batch_host_vectors_and_keyword_only():
    """A batch mixing device-embedded, explicit-host-vector, and
    embedding-less queries exercises the on-device scatter assembly."""
    rng = random.Random(29)
    engine, oracle_engine, client, vocab, _ = _build(rng)
    dev_queries = list(dict.fromkeys(
        " ".join(rng.choices(vocab, k=2)) for _ in range(4)
    ))
    canon = _canonical_embeddings(client, dev_queries)
    host_emb = hash_embedder.embed_text("host-query", DIM)
    requests = [(q, None, 5) for q in dev_queries]
    requests.insert(1, (vocab[0], host_emb, 5))        # explicit vector
    requests.insert(3, (vocab[1], [], 5))              # keyword-only
    batch = engine.search_batch(requests, now=NOW)
    for (query, emb, k), hits in zip(requests, batch):
        if emb is None:
            emb = [float(v) for v in canon[query]]
        expected = oracle_engine.search(query, emb, k, now=NOW)
        assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]
        for h, e in zip(hits, expected):
            assert round(h.score, 4) == round(e.score, 4)


def test_device_query_escalation_materializes_exact_rows():
    """DD margin escalations need the EXACT query bits on the host
    (ensure_host_q). Force them by planting pairs of corpus rows whose
    embedding IS the canonical device embedding of the query text: the
    top-2 are then exact ties (cosine 1) with nonzero DD margins — the
    certificate cannot rank them and must escalate to the bit-exact host
    rescore, which must see the materialized canonical rows to agree with
    the oracle."""
    rng = random.Random(31)
    engine, oracle_engine, client, vocab, chunks = _build(rng, n=240)
    queries = list(dict.fromkeys(
        " ".join(rng.choices(vocab, k=2)) for _ in range(4)
    ))
    canon = _canonical_embeddings(client, queries)
    extra = []
    base = len(chunks)
    for j, q in enumerate(queries):
        for t in range(2):  # a tied PAIR per query, same content/timestamp
            extra.append(
                ChunkRecord(
                    id=f"d:tie{j}{t}", document_id="d",
                    chunk_index=base + 2 * j + t,
                    content=f"tied row {j}",
                    embedding=[float(v) for v in canon[q]],
                    created_at_utc=T0 + timedelta(hours=1),
                )
            )
    # upsert_chunks REPLACES the document's chunk list (reference
    # semantics) — write the combined list, append only the new rows
    engine.store.upsert_chunks(chunks + extra)
    engine.on_chunks_upserted(extra, new=True)
    # k=2: the tied pair (cosine 1) IS the top-2, so the scan certificate
    # passes and the DD ranking margin is what fails — the pure escalation
    # path (larger k would fail the scan certificate first and measure the
    # coarse prepass, not DD materialization)
    requests = [(q, None, 2) for q in queries]
    _assert_oracle_match(engine, oracle_engine, client, requests)
    assert engine.stats["dd_escalations_total"] > 0


def test_device_query_without_dd_mode_stays_exact():
    """Without device_exact_cos the compact path host-rescores every
    candidate — the lazy materialization must fire for every batch and
    scores stay bit-exact vs the oracle."""
    rng = random.Random(37)
    engine, oracle_engine, client, vocab, _ = _build(rng, dd=False)
    queries = list(dict.fromkeys(
        " ".join(rng.choices(vocab, k=2)) for _ in range(6)
    ))
    requests = [(q, None, 5) for q in queries]
    canon = _canonical_embeddings(client, queries)
    batch = engine.search_batch(requests, now=NOW)
    for (query, _, k), hits in zip(requests, batch):
        emb = [float(v) for v in canon[query]]
        expected = oracle_engine.search(query, emb, k, now=NOW)
        assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]
        assert [h.score for h in hits] == [h.score for h in expected]
    assert engine.stats["dd_resolved_total"] == 0


def test_attach_device_embedder_validation():
    store = InMemoryIngestionStore()
    oracle_engine = RecallEngine(
        store, None, EngineOptions(backend="oracle", recent_window=0)
    )
    with pytest.raises(ValueError):
        oracle_engine.attach_device_embedder(_client())
    dev = RecallEngine(
        store,
        options=EngineOptions(
            backend="pallas", scan_dtype="int8", embedding_dim=DIM + 8,
            capacity_block=128, bloom_bits=256, recent_window=0,
        ),
    )
    with pytest.raises(ValueError):  # dim mismatch
        dev.attach_device_embedder(_client())
    dev2 = RecallEngine(
        store,
        options=EngineOptions(
            backend="pallas", scan_dtype="int8", embedding_dim=DIM,
            capacity_block=128, bloom_bits=256, recent_window=0,
        ),
    )
    client = _client()
    dev2.attach_device_embedder(client)
    assert dev2._device_embedder is client
    dev2.attach_device_embedder(None)
    assert dev2._device_embedder is None


def test_app_wires_device_query_for_local_provider():
    """Composition root: Embeddings:Provider=Local + a device engine turn
    the device-resident query pipeline on end-to-end (and the search
    service stops calling the host embed)."""
    from omni_recall_tpu.config import AppConfig
    from omni_recall_tpu.server.app import OmniRecallApp

    cfg = AppConfig()
    cfg.embeddings.provider = "Local"
    cfg.engine.backend = "pallas"
    cfg.engine.scan_dtype = "int8"
    cfg.engine.capacity_block = 128
    app = OmniRecallApp(cfg)
    assert app.search_service.device_query is True
    assert app.engine._device_embedder is app.embedding_client

    cfg2 = AppConfig()
    cfg2.embeddings.provider = "Local"
    cfg2.embeddings.device_query = False
    cfg2.engine.backend = "pallas"
    cfg2.engine.scan_dtype = "int8"
    cfg2.engine.capacity_block = 128
    app2 = OmniRecallApp(cfg2)
    assert app2.search_service.device_query is False
    assert app2.engine._device_embedder is None


def test_search_service_device_query_skips_host_embed():
    """RecallSearchService(device_query=True) must not call the embedding
    client's host embed() at all — the engine owns query embedding."""
    from omni_recall_tpu.search.service import RecallSearchService

    rng = random.Random(41)
    engine, _, client, vocab, _ = _build(rng, n=60)
    calls = {"embed": 0}
    orig = client.embed

    def counting_embed(text):
        calls["embed"] += 1
        return orig(text)

    client.embed = counting_embed
    svc = RecallSearchService(engine, client, device_query=True)
    resp = svc.search(vocab[0], 5, now=NOW)
    assert calls["embed"] == 0
    assert len(resp.citations) == 5
