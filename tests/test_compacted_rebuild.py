"""Compacted rebuild (DeviceIndex.append_from_index): rebuild_index reuses
the old index's derived columns — bloom signatures, normalized/raw
embeddings, norms, timestamps, arena bytes, quantized device planes — for
records whose identity is unchanged, re-deriving only replaced records.

Every assertion compares against an index built through the plain append
derivation path: reuse must be observationally invisible (bit-identical
columns, identical search results), never a semantic change.
"""

from datetime import datetime, timedelta, timezone

import numpy as np

from omni_recall_tpu.config import EngineOptions
from omni_recall_tpu.index.device_index import DeviceIndex
from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord
from omni_recall_tpu.index.store import InMemoryIngestionStore
from omni_recall_tpu.models import hash_embedder
from omni_recall_tpu.search.engine import RecallEngine

T0 = datetime(2026, 8, 1, tzinfo=timezone.utc)
NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)
DIM = 32


def _mk_engine(n=24, n_docs=3, dim=DIM, **opt_kw):
    store = InMemoryIngestionStore()
    opt_kw.setdefault("backend", "xla")
    opts = EngineOptions(
        embedding_dim=dim, recent_window=300, candidate_m=8,
        capacity_block=128, bloom_bits=128, **opt_kw,
    )
    engine = RecallEngine(store, options=opts)
    chunks = []
    for d in range(n_docs):
        doc_id = f"doc{d}"
        store.upsert_document(
            DocumentRecord(id=doc_id, file_name=f"{doc_id}.txt", created_at_utc=T0)
        )
        doc_chunks = [
            ChunkRecord(
                id=f"{doc_id}:{i:04d}", document_id=doc_id, chunk_index=i,
                content=f"chunk {i} of {doc_id} about recall topics",
                embedding=hash_embedder.embed_text(f"{doc_id} chunk {i}", dim),
                created_at_utc=T0 + timedelta(minutes=d * n + i),
            )
            for i in range(n)
        ]
        store.upsert_chunks(doc_chunks)
        engine.on_chunks_upserted(doc_chunks, new=True)
        chunks.extend(doc_chunks)
    return store, engine, chunks


def _fresh_copy(store, engine):
    """An engine over the same store whose index was built with plain
    append (the derivation path) — the bit-identity oracle."""
    fresh = RecallEngine(store, options=engine.options)
    chunks = []
    for doc in store.list_documents(2**31 - 1):
        chunks.extend(store.get_chunks_by_document_id(doc.id))
    chunks.sort(key=lambda c: c.seq)
    fresh.device_index.append(chunks)
    return fresh


def _assert_index_equal(a: DeviceIndex, b: DeviceIndex):
    assert a.n_rows == b.n_rows
    n = a.n_rows
    np.testing.assert_array_equal(a.bloom[:n], b.bloom[:n])
    np.testing.assert_array_equal(a.emb[:n], b.emb[:n])
    np.testing.assert_array_equal(a.raw_emb[:n], b.raw_emb[:n])
    np.testing.assert_array_equal(a.raw_norm_sq[:n], b.raw_norm_sq[:n])
    np.testing.assert_array_equal(a.created[:n], b.created[:n])
    np.testing.assert_array_equal(a.created_us[:n], b.created_us[:n])
    np.testing.assert_array_equal(a.created_ts[:n], b.created_ts[:n])
    np.testing.assert_array_equal(a.seqs[:n], b.seqs[:n])
    np.testing.assert_array_equal(
        a.content_off[: n + 1], b.content_off[: n + 1]
    )
    assert bytes(a._arena[: a.content_off[n]]) == bytes(
        b._arena[: b.content_off[n]]
    )
    assert [c.id for c in a.meta] == [c.id for c in b.meta]
    assert a._row_by_chunk_id == b._row_by_chunk_id


def test_rebuild_compacts_tombstones_bit_identically():
    store, engine, chunks = _mk_engine()
    store.delete_document("doc1")
    engine.on_document_deleted("doc1")
    engine.rebuild_index()
    fresh = _fresh_copy(store, engine)
    _assert_index_equal(engine.device_index, fresh.device_index)
    assert engine.device_index.n_rows == 48  # doc1's 24 rows compacted away

    hits = engine.search("chunk 3 of doc2", None, 5, now=NOW)
    ref = fresh.search("chunk 3 of doc2", None, 5, now=NOW)
    assert [(h.chunk.id, h.score) for h in hits] == [
        (h.chunk.id, h.score) for h in ref
    ]


def test_rebuild_reflects_inplace_embedding_update():
    """update_embedding mutates arrays in place and keeps the meta object —
    the identity test must still hold AND the reused columns must carry the
    UPDATED values."""
    store, engine, chunks = _mk_engine(n_docs=1)
    new_emb = hash_embedder.embed_text("completely different text", DIM)
    target = chunks[5]
    target.embedding = new_emb
    engine.device_index.update_embedding(target.id, new_emb)
    engine.rebuild_index()
    fresh = _fresh_copy(store, engine)
    _assert_index_equal(engine.device_index, fresh.device_index)
    row = engine.device_index._row_by_chunk_id[target.id]
    np.testing.assert_array_equal(
        engine.device_index.raw_emb[row], np.asarray(new_emb, np.float32)
    )


def test_rebuild_rederives_replaced_records():
    """A store upsert replaces record objects (reference semantics) — the
    identity test fails and those chunks re-derive, landing interleaved
    between reused rows (mixed hit/miss arena assembly)."""
    store, engine, chunks = _mk_engine(n_docs=3)
    # replace doc1's records: same ids/seqs, new content + embeddings
    replaced = [
        ChunkRecord(
            id=c.id, document_id=c.document_id, chunk_index=c.chunk_index,
            content=f"REWRITTEN {c.chunk_index} with new words entirely",
            embedding=hash_embedder.embed_text(f"rewritten {c.chunk_index}", DIM),
            created_at_utc=c.created_at_utc, seq=c.seq,
        )
        for c in chunks if c.document_id == "doc1"
    ]
    store.upsert_chunks(replaced)
    engine.rebuild_index()
    fresh = _fresh_copy(store, engine)
    _assert_index_equal(engine.device_index, fresh.device_index)

    hits = engine.search("rewritten with new words", None, 3, now=NOW)
    assert hits and hits[0].chunk.document_id == "doc1"
    assert "REWRITTEN" in hits[0].chunk.content


def test_rebuild_adopts_device_planes_when_all_rows_reused(monkeypatch):
    """Single-device, all-hit compaction gathers the quantized planes ON
    DEVICE: the adopted planes must match a from-scratch host build."""
    store, engine, chunks = _mk_engine(
        n_docs=2, scan_dtype="int8", backend="pallas"
    )
    dev_old = engine.device_index.device_arrays()
    assert dev_old is not None
    store.delete_document("doc0")
    engine.on_document_deleted("doc0")
    # sync the tombstone writes so the planes are current pre-rebuild
    engine.device_index.device_arrays()
    calls = []
    orig = DeviceIndex._adopt_compacted_planes
    monkeypatch.setattr(
        DeviceIndex, "_adopt_compacted_planes",
        lambda self, odev, src: (calls.append(1), orig(self, odev, src))[1],
    )
    engine.rebuild_index()
    new_index = engine.device_index
    # the adoption ran and installed planes without marking anything dirty
    assert calls
    assert new_index._device is not None
    assert not new_index._dirty_blocks

    fresh = _fresh_copy(store, engine)
    dev_a = new_index.device_arrays()
    dev_b = fresh.device_index.device_arrays()
    n = new_index.n_rows
    np.testing.assert_array_equal(
        np.asarray(dev_a.emb)[:n], np.asarray(dev_b.emb)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(dev_a.bloom)[:n], np.asarray(dev_b.bloom)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(dev_a.scale)[:n], np.asarray(dev_b.scale)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(dev_a.err)[:n], np.asarray(dev_b.err)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(dev_a.valid), np.asarray(dev_a.valid)  # pad rows masked
    )
    assert bool(np.all(np.asarray(dev_a.valid)[:n]))
    assert not bool(np.any(np.asarray(dev_a.valid)[n:]))

    hits = engine.search("chunk 7 of doc1", None, 5, now=NOW)
    ref = fresh.search("chunk 7 of doc1", None, 5, now=NOW)
    assert [(h.chunk.id, h.score) for h in hits] == [
        (h.chunk.id, h.score) for h in ref
    ]


def test_rebuild_falls_back_when_planes_dirty(monkeypatch):
    """Un-synced host mutations (dirty blocks) must block plane adoption —
    stale old planes could resurrect pre-mutation values — and the rebuild
    still works through the standard upload path."""
    store, engine, chunks = _mk_engine(n_docs=2, scan_dtype="int8",
                                       backend="pallas")
    engine.device_index.device_arrays()
    store.delete_document("doc0")
    engine.on_document_deleted("doc0")  # marks blocks dirty, no sync
    assert engine.device_index._dirty_blocks
    calls = []
    monkeypatch.setattr(
        DeviceIndex, "_adopt_compacted_planes",
        lambda self, odev, src: calls.append(1),
    )
    engine.rebuild_index()
    assert not calls  # adoption skipped
    fresh = _fresh_copy(store, engine)
    _assert_index_equal(engine.device_index, fresh.device_index)
    hits = engine.search("chunk 3 of doc1", None, 3, now=NOW)
    ref = fresh.search("chunk 3 of doc1", None, 3, now=NOW)
    assert [(h.chunk.id, h.score) for h in hits] == [
        (h.chunk.id, h.score) for h in ref
    ]


def test_append_from_index_rejects_parameter_mismatch():
    store, engine, chunks = _mk_engine(n_docs=1)
    other = DeviceIndex(DIM, bloom_bits=256)
    import pytest

    with pytest.raises(ValueError):
        other.append_from_index(engine.device_index, chunks)
