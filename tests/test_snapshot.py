"""Snapshot/restore round-trip: restored index reproduces identical rankings."""

import random
import string
from datetime import datetime, timedelta, timezone

from omni_recall_tpu.config import EngineOptions
from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord
from omni_recall_tpu.index.snapshot import load_snapshot, restore_engine, save_snapshot
from omni_recall_tpu.index.store import InMemoryIngestionStore
from omni_recall_tpu.models import hash_embedder
from omni_recall_tpu.search.engine import RecallEngine

DIM = 32
T0 = datetime(2026, 8, 1, tzinfo=timezone.utc)
NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)


def _build_store(rng):
    store = InMemoryIngestionStore()
    vocab = ["".join(rng.choices(string.ascii_lowercase, k=5)) for _ in range(30)]
    for d in range(3):
        store.upsert_document(
            DocumentRecord(
                id=f"doc_{d}", file_name=f"f{d}.txt", content_hash=f"h{d}",
                chunk_count=10, created_at_utc=T0 + timedelta(hours=d),
            )
        )
        chunks = [
            ChunkRecord(
                id=f"doc_{d}:{i:04d}", document_id=f"doc_{d}", chunk_index=i,
                content=" ".join(rng.choices(vocab, k=8)),
                embedding=hash_embedder.embed_text(f"{d}-{i}", DIM) if i % 4 else None,
                created_at_utc=T0 + timedelta(hours=d, minutes=i),
            )
            for i in range(10)
        ]
        store.upsert_chunks(chunks)
    return store, vocab


def test_snapshot_roundtrip_identical_rankings(tmp_path):
    rng = random.Random(42)
    store, vocab = _build_store(rng)
    save_snapshot(store, tmp_path / "snap")

    restored = load_snapshot(tmp_path / "snap")
    assert len(restored.list_documents(100)) == 3
    orig_recent = [c.id for c in store.get_recent_chunks(1000)]
    rest_recent = [c.id for c in restored.get_recent_chunks(1000)]
    assert orig_recent == rest_recent  # seq ordering survives

    opts = EngineOptions(backend="xla", embedding_dim=DIM, capacity_block=128)
    engine_a = RecallEngine(store, options=opts)
    restore_engine(store, engine_a)
    engine_b = RecallEngine(restored, options=opts)
    restore_engine(restored, engine_b)

    for trial in range(5):
        query = " ".join(rng.choices(vocab, k=2))
        emb = hash_embedder.embed_text(query, DIM)
        hits_a = engine_a.search(query, emb, 7, now=NOW)
        hits_b = engine_b.search(query, emb, 7, now=NOW)
        assert [h.chunk.id for h in hits_a] == [h.chunk.id for h in hits_b]
        assert [h.score for h in hits_a] == [h.score for h in hits_b]


def test_snapshot_preserves_embeddings_and_missing(tmp_path):
    rng = random.Random(1)
    store, _ = _build_store(rng)
    save_snapshot(store, tmp_path / "s")
    restored = load_snapshot(tmp_path / "s")
    orig = {c.id: c for c in store.get_recent_chunks(1000)}
    rest = {c.id: c for c in restored.get_recent_chunks(1000)}
    assert orig.keys() == rest.keys()
    for cid, c in orig.items():
        r = rest[cid]
        assert (c.embedding is None) == (r.embedding is None)
        if c.embedding is not None:
            assert list(map(float, c.embedding)) == list(map(float, r.embedding))
        assert c.created_at_utc == r.created_at_utc
        assert c.content == r.content


def test_snapshot_new_ingests_after_restore_get_fresh_seqs(tmp_path):
    rng = random.Random(2)
    store, _ = _build_store(rng)
    save_snapshot(store, tmp_path / "s")
    restored = load_snapshot(tmp_path / "s")
    max_seq = max(c.seq for c in restored.get_recent_chunks(1000))
    restored.upsert_chunks([
        ChunkRecord(id="new:0000", document_id="new", chunk_index=0,
                    content="fresh", created_at_utc=NOW)
    ])
    fresh = [c for c in restored.get_recent_chunks(1) if c.id == "new:0000"]
    assert fresh and fresh[0].seq == max_seq + 1


def test_snapshot_preserves_float64_embeddings(tmp_path):
    """The oracle/host paths score raw embeddings in float64 — a snapshot
    round-trip must return the exact values, not f32-rounded ones."""
    from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord
    from omni_recall_tpu.index.snapshot import load_snapshot, save_snapshot
    from omni_recall_tpu.index.store import InMemoryIngestionStore

    store = InMemoryIngestionStore()
    store.upsert_document(DocumentRecord(id="d1", file_name="a.txt"))
    vec = [0.1234567890123456789, -1.0000000000000002, 3.141592653589793]
    store.upsert_chunks([ChunkRecord(
        id="d1:0", document_id="d1", chunk_index=0, content="x",
        embedding=vec,
    )])
    save_snapshot(store, tmp_path)
    restored = load_snapshot(tmp_path)
    got = restored.get_chunks_by_document_id("d1")[0].embedding
    assert got == vec  # exact, not f32-rounded


def test_snapshot_single_atomic_file(tmp_path):
    """The snapshot is ONE archive (atomic rename): no split meta/npz pair
    that a crash could desynchronize."""
    from omni_recall_tpu.index.records import DocumentRecord
    from omni_recall_tpu.index.snapshot import save_snapshot
    from omni_recall_tpu.index.store import InMemoryIngestionStore

    store = InMemoryIngestionStore()
    store.upsert_document(DocumentRecord(id="d1", file_name="a.txt"))
    save_snapshot(store, tmp_path)
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["snapshot.npz"]
