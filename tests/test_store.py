"""In-memory store tests (behavioral mirror of InMemoryIngestionStore.cs)."""

from datetime import datetime, timedelta, timezone

from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord


T0 = datetime(2026, 8, 1, tzinfo=timezone.utc)


def _doc(i, created):
    return DocumentRecord(id=f"doc_{i}", file_name=f"f{i}.txt", created_at_utc=created)


def _chunk(doc_id, idx, created, content="x"):
    return ChunkRecord(
        id=f"{doc_id}:{idx:04d}",
        document_id=doc_id,
        chunk_index=idx,
        content=content,
        created_at_utc=created,
    )


def test_upsert_replaces_chunks_sorted_by_index(store):
    store.upsert_document(_doc(1, T0))
    store.upsert_chunks([_chunk("doc_1", 1, T0), _chunk("doc_1", 0, T0)])
    chunks = store.get_chunks_by_document_id("doc_1")
    assert [c.chunk_index for c in chunks] == [0, 1]
    # upsert REPLACES the document's whole chunk list (reference:
    # InMemoryIngestionStore.cs:17-25 assigns the new list outright) —
    # chunks absent from the new list are dropped
    store.upsert_chunks([_chunk("doc_1", 0, T0, content="updated")])
    chunks = store.get_chunks_by_document_id("doc_1")
    assert len(chunks) == 1
    assert chunks[0].content == "updated"


def test_recent_chunks_sorted_desc_and_limited(store):
    for i in range(3):
        created = T0 + timedelta(days=i)
        store.upsert_document(_doc(i, created))
        store.upsert_chunks([_chunk(f"doc_{i}", 0, created)])
    recent = store.get_recent_chunks(2)
    assert [c.document_id for c in recent] == ["doc_2", "doc_1"]


def test_recent_chunks_tie_break_by_insertion_order(store):
    store.upsert_document(_doc(1, T0))
    store.upsert_document(_doc(2, T0))
    store.upsert_chunks([_chunk("doc_1", 0, T0)])
    store.upsert_chunks([_chunk("doc_2", 0, T0)])
    recent = store.get_recent_chunks(10)
    # equal timestamps: later insertion first (desc by seq)
    assert [c.document_id for c in recent] == ["doc_2", "doc_1"]


def test_list_documents_desc_and_get_by_ids(store):
    store.upsert_document(_doc(1, T0))
    store.upsert_document(_doc(2, T0 + timedelta(hours=1)))
    docs = store.list_documents(10)
    assert [d.id for d in docs] == ["doc_2", "doc_1"]
    by_id = store.get_documents_by_ids(["doc_1", "missing"])
    assert set(by_id) == {"doc_1"}


def test_delete_document_removes_chunks(store):
    store.upsert_document(_doc(1, T0))
    store.upsert_chunks([_chunk("doc_1", 0, T0)])
    store.delete_document("doc_1")
    assert store.get_document("doc_1") is None
    assert store.get_chunks_by_document_id("doc_1") == []
    assert store.get_recent_chunks(10) == []


def test_bulk_load_matches_incremental_append():
    import numpy as np
    from datetime import datetime, timedelta, timezone

    from omni_recall_tpu.index.device_index import DeviceIndex, to_days
    from omni_recall_tpu.index.records import ChunkRecord
    from omni_recall_tpu.models import hash_embedder
    from omni_recall_tpu.ops import hashing

    t0 = datetime(2026, 8, 1, tzinfo=timezone.utc)
    chunks = [
        ChunkRecord(id=f"c:{i}", document_id="d", chunk_index=i,
                    content=f"bulk chunk {i} words", seq=i,
                    embedding=hash_embedder.embed_text(f"chunk {i}", 16),
                    created_at_utc=t0 + timedelta(minutes=i))
        for i in range(20)
    ]
    incremental = DeviceIndex(16, capacity_block=128, bloom_bits=128)
    incremental.append(chunks)

    emb = np.stack([incremental.emb[i] for i in range(20)])
    bloom = np.stack([
        hashing.chunk_signature(c.content.lower(), 128, 4, 1) for c in chunks
    ])
    created = np.asarray([to_days(c.created_at_utc) for c in chunks], np.float32)
    bulk = DeviceIndex(16, capacity_block=128, bloom_bits=128)
    bulk.bulk_load(emb, bloom, created, chunks)

    assert bulk.n_valid == incremental.n_valid == 20
    np.testing.assert_array_equal(bulk.emb[:20], incremental.emb[:20])
    np.testing.assert_array_equal(bulk.bloom[:20], incremental.bloom[:20])
    np.testing.assert_array_equal(bulk.created[:20], incremental.created[:20])
