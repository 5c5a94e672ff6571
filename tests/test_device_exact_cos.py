"""Device-exact cosine serving mode (EngineOptions.device_exact_cos).

The DD path replaces the host rescore's embedding stream with a device
double-float dot + margin certificate (ops/exact_cos.py). The contract:
results are DTO-identical to the oracle — same citation ids, same ORDER,
same 4-decimal scores — with raw engine scores within the certified margin
(~1e-10). Near-ties (e.g. duplicate embeddings) must escalate to the
bit-exact host path, never return an uncertified ranking."""

import random
import string
from datetime import datetime, timedelta, timezone

from omni_recall_tpu.config import EngineOptions
from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord
from omni_recall_tpu.index.store import InMemoryIngestionStore
from omni_recall_tpu.models import hash_embedder
from omni_recall_tpu.search.engine import RecallEngine

DIM = 32
T0 = datetime(2026, 8, 1, tzinfo=timezone.utc)
NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)


def _build(rng, n=300, dup_pairs=0):
    store = InMemoryIngestionStore()
    engine = RecallEngine(
        store,
        options=EngineOptions(
            backend="pallas", scan_dtype="int8", embedding_dim=DIM,
            capacity_block=128, candidate_m=16, bloom_bits=256,
            recent_window=0, device_exact_cos=True,
        ),
    )
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
    chunks = []
    for i in range(n):
        content = " ".join(rng.choices(vocab, k=rng.randint(4, 15)))
        emb = hash_embedder.embed_text(f"c{i}", DIM)
        chunks.append(
            ChunkRecord(
                id=f"d:{i:04d}", document_id="d", chunk_index=i,
                content=content, embedding=emb,
                created_at_utc=T0 + timedelta(minutes=i),
            )
        )
    # duplicate rows: bitwise-equal embeddings + content + timestamp ->
    # exactly tied oracle scores; the DD margin cannot separate them, so
    # these queries must ESCALATE (and still come back oracle-identical)
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
    return engine, oracle_engine, vocab, chunks


def _assert_oracle_match(engine, oracle_engine, requests):
    batch = engine.search_batch(requests, now=NOW)
    for (query, emb, k), hits in zip(requests, batch):
        expected = oracle_engine.search(query, emb, k, now=NOW)
        assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]
        for h, e in zip(hits, expected):
            assert round(h.score, 4) == round(e.score, 4)
            assert abs(h.score - e.score) < 1e-9


def test_dd_mode_matches_oracle_and_resolves_on_device():
    rng = random.Random(11)
    engine, oracle_engine, vocab, _ = _build(rng)
    assert engine.device_index.exact_cos
    requests = []
    for i in range(12):
        query = " ".join(rng.choices(vocab, k=rng.randint(1, 3)))
        emb = (
            hash_embedder.embed_text(f"q{i}", DIM)
            if rng.random() < 0.75 else []  # keyword-only rows ride DD too
        )
        requests.append((query, emb, rng.choice([1, 3, 10])))
    _assert_oracle_match(engine, oracle_engine, requests)
    # the well-separated corpus certifies on device — no escalation storm
    assert engine.stats["dd_resolved_total"] > 0
    assert (
        engine.stats["dd_escalations_total"]
        < engine.stats["dd_resolved_total"]
    )


def test_dd_mode_duplicate_rows_escalate_and_stay_exact():
    rng = random.Random(13)
    engine, oracle_engine, vocab, chunks = _build(rng, n=300, dup_pairs=6)
    # target the duplicated rows: query embedding == the duplicated chunk's
    # embedding makes the tied pair the top-2 -> margin tie -> escalation
    requests = [
        (chunks[j].content.split()[0], chunks[j].embedding, 5)
        for j in range(6)
    ]
    _assert_oracle_match(engine, oracle_engine, requests)
    assert engine.stats["dd_escalations_total"] > 0


def test_dd_mode_single_search_and_empty_query():
    rng = random.Random(17)
    engine, oracle_engine, vocab, _ = _build(rng, n=64)
    q = vocab[0]
    emb = hash_embedder.embed_text("zq", DIM)
    hits = engine.search(q, emb, 5, now=NOW)
    expected = oracle_engine.search(q, emb, 5, now=NOW)
    assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]
    # empty embedding (keyword-only): cosine is exactly 0 on both paths,
    # margins are 0, ties certify through the recency/seq tie-break
    hits = engine.search(vocab[1], [], 10, now=NOW)
    expected = oracle_engine.search(vocab[1], [], 10, now=NOW)
    assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]
    assert [h.score for h in hits] == [h.score for h in expected]


def test_dd_mode_off_keeps_bit_exact_scores():
    """Default config (device_exact_cos=False): raw plane absent, scores
    remain bit-identical to the oracle (the r2 parity contract)."""
    rng = random.Random(19)
    store = InMemoryIngestionStore()
    engine = RecallEngine(
        store,
        options=EngineOptions(
            backend="pallas", scan_dtype="int8", embedding_dim=DIM,
            capacity_block=128, candidate_m=16, bloom_bits=256,
            recent_window=0,
        ),
    )
    assert not engine.device_index.exact_cos
    oracle_engine = RecallEngine(
        store, None, EngineOptions(backend="oracle", recent_window=0)
    )
    vocab = ["alpha", "bravo", "charlie", "delta"]
    store.upsert_document(DocumentRecord(id="d", file_name="d.txt", created_at_utc=T0))
    chunks = [
        ChunkRecord(
            id=f"d:{i}", document_id="d", chunk_index=i,
            content=" ".join(rng.choices(vocab, k=5)),
            embedding=hash_embedder.embed_text(f"c{i}", DIM),
            created_at_utc=T0 + timedelta(minutes=i),
        )
        for i in range(80)
    ]
    store.upsert_chunks(chunks)
    engine.on_chunks_upserted(chunks, new=True)
    assert engine.device_index.device_arrays().raw is None
    q = "alpha bravo"
    emb = hash_embedder.embed_text(q, DIM)
    hits = engine.search(q, emb, 5, now=NOW)
    expected = oracle_engine.search(q, emb, 5, now=NOW)
    assert [h.score for h in hits] == [h.score for h in expected]
    assert engine.stats["dd_resolved_total"] == 0
