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
    # v2 returns zero-copy f64 array views; values must be exact, not
    # f32-rounded
    assert list(got) == vec


def test_snapshot_single_atomic_archive(tmp_path):
    """The snapshot is ONE archive directory swapped in by rename: no split
    pieces a crash could desynchronize, no temp/old residue after save."""
    from omni_recall_tpu.index.records import DocumentRecord
    from omni_recall_tpu.index.snapshot import save_snapshot
    from omni_recall_tpu.index.store import InMemoryIngestionStore

    store = InMemoryIngestionStore()
    store.upsert_document(DocumentRecord(id="d1", file_name="a.txt"))
    save_snapshot(store, tmp_path)
    save_snapshot(store, tmp_path)  # overwrite works and leaves no residue
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["snapshot.d"]
    inner = {p.name for p in (tmp_path / "snapshot.d").iterdir()}
    assert "meta.json" in inner


def _int8_engine():
    return RecallEngine(
        InMemoryIngestionStore(),
        options=EngineOptions(
            backend="pallas", embedding_dim=DIM, recent_window=0,
            candidate_m=16, bloom_bits=256, scan_dtype="int8",
            capacity_block=512, refine=True,
        ),
    )


def _queries(rng, vocab, n=12):
    reqs = []
    for i in range(n):
        emb = hash_embedder.embed_text(f"q{i}", DIM) if i % 3 else None
        reqs.append((" ".join(rng.choices(vocab, k=2)), emb, 5))
    return reqs


def test_slab_snapshot_fast_restore_bit_identical(tmp_path):
    """v2 slab restore (no re-hash/re-quantize) must reproduce bit-identical
    search results vs a full rebuild, and must actually take the fast path
    (preconverted planes consumed, not re-derived)."""
    rng = random.Random(5)
    store, vocab = _build_store(rng)

    src = _int8_engine()
    src.store = store
    chunks = []
    for doc in store.list_documents(1 << 30):
        chunks.extend(store.get_chunks_by_document_id(doc.id))
    chunks.sort(key=lambda c: c.seq)
    src.device_index.append(chunks)

    from omni_recall_tpu.index.snapshot import load_snapshot_full

    save_snapshot(store, tmp_path / "s", device_index=src.device_index)
    restored_store, aux = load_snapshot_full(tmp_path / "s")
    assert aux is not None and aux["slabs"] is not None

    fast = _int8_engine()
    fast.store = restored_store
    restore_engine(restored_store, fast, aux=aux)
    # fast path taken: pre-quantized planes are staged for the first upload
    assert fast.device_index._preconverted is not None
    assert fast.device_index.n_rows == len(chunks)

    slow = _int8_engine()
    slow.store = restored_store
    restore_engine(restored_store, slow)  # rebuild path (hash + quantize)

    reqs = _queries(rng, vocab)
    out_src = src.search_batch(reqs, now=NOW)
    out_fast = fast.search_batch(reqs, now=NOW)
    out_slow = slow.search_batch(reqs, now=NOW)
    for hs, hf, hl in zip(out_src, out_fast, out_slow):
        assert [h.chunk.id for h in hs] == [h.chunk.id for h in hf]
        assert [h.score for h in hs] == [h.score for h in hf]
        assert [h.chunk.id for h in hf] == [h.chunk.id for h in hl]
        assert [h.score for h in hf] == [h.score for h in hl]

    # host mirrors bit-identical to the rebuilt index (exact-rescore inputs)
    import numpy as np

    df, dl = fast.device_index, slow.device_index
    n = dl.n_rows
    assert np.array_equal(df.emb[:n], dl.emb[:n])
    assert np.array_equal(df.bloom[:n], dl.bloom[:n])
    assert np.array_equal(df.raw_emb[:n], dl.raw_emb[:n])
    assert np.array_equal(df.raw_norm_sq[:n], dl.raw_norm_sq[:n])
    assert np.array_equal(df.created_us[:n], dl.created_us[:n])
    assert bytes(df._arena) == bytes(dl._arena)


def test_slab_restore_rejects_tampered_or_mismatched(tmp_path):
    """A corrupted slab or mismatched engine parameters must fall back to
    the rebuild path (never an unsound index)."""
    import numpy as np

    from omni_recall_tpu.index.snapshot import load_snapshot_full

    rng = random.Random(6)
    store, vocab = _build_store(rng)
    src = _int8_engine()
    src.store = store
    chunks = []
    for doc in store.list_documents(1 << 30):
        chunks.extend(store.get_chunks_by_document_id(doc.id))
    chunks.sort(key=lambda c: c.seq)
    src.device_index.append(chunks)
    save_snapshot(store, tmp_path / "s", device_index=src.device_index)

    restored_store, aux = load_snapshot_full(tmp_path / "s")
    # tamper: flip a bloom byte -> integrity sample must reject
    aux_bad = dict(aux)
    aux_bad["slabs"] = dict(aux["slabs"])
    bad_bloom = np.array(aux["slabs"]["bloom"])
    bad_bloom[3, 0] ^= 0xFF
    aux_bad["slabs"]["bloom"] = bad_bloom
    eng = _int8_engine()
    eng.store = restored_store
    restore_engine(restored_store, eng, aux=aux_bad)
    assert eng.device_index._preconverted is None  # rebuild path used
    assert eng.device_index.n_rows == len(chunks)

    # mismatched params (different bloom width) -> fallback, still correct
    eng2 = RecallEngine(
        InMemoryIngestionStore(),
        options=EngineOptions(
            backend="pallas", embedding_dim=DIM, recent_window=0,
            candidate_m=16, bloom_bits=512, scan_dtype="int8",
            capacity_block=512, refine=True,
        ),
    )
    eng2.store = restored_store
    restore_engine(restored_store, eng2, aux=aux)
    assert eng2.device_index._preconverted is None
    assert eng2.device_index.n_rows == len(chunks)

    reqs = _queries(rng, vocab)
    out_src = src.search_batch(reqs, now=NOW)
    for eng_x in (eng, eng2):
        out_x = eng_x.search_batch(reqs, now=NOW)
        for hs, hx in zip(out_src, out_x):
            assert [h.chunk.id for h in hs] == [h.chunk.id for h in hx]
            assert [h.score for h in hs] == [h.score for h in hx]


def _engine_with_store(store):
    eng = _int8_engine()
    eng.store = store
    chunks = []
    for doc in store.list_documents(1 << 30):
        chunks.extend(store.get_chunks_by_document_id(doc.id))
    chunks.sort(key=lambda c: c.seq)
    eng.device_index.append(chunks)
    return eng, chunks


def test_save_reads_back_device_planes(tmp_path):
    """After a device sync, save_snapshot reads the live device planes back
    (deriv == 'device') instead of re-quantizing on the host, and the
    restored engine reproduces bit-identical results."""
    import json

    rng = random.Random(9)
    store, vocab = _build_store(rng)
    src, chunks = _engine_with_store(store)
    src.device_index.device_arrays()  # sync: planes now live on device

    from omni_recall_tpu.index.snapshot import load_snapshot_full

    save_snapshot(store, tmp_path / "s", device_index=src.device_index)
    meta = json.loads(
        (tmp_path / "s" / "snapshot.d" / "meta.json").read_text()
    )
    assert meta["slabs"]["deriv"] == "device"

    restored_store, aux = load_snapshot_full(tmp_path / "s")
    eng = _int8_engine()
    eng.store = restored_store
    restore_engine(restored_store, eng, aux=aux)
    assert eng.device_index._preconverted is not None  # fast path taken

    # save-after-restore reuses the staged planes (no device sync yet)
    save_snapshot(restored_store, tmp_path / "s2", device_index=eng.device_index)
    meta2 = json.loads(
        (tmp_path / "s2" / "snapshot.d" / "meta.json").read_text()
    )
    assert meta2["slabs"]["deriv"] == "staged"

    reqs = _queries(rng, vocab)
    out_src = src.search_batch(reqs, now=NOW)
    out_r = eng.search_batch(reqs, now=NOW)
    for hs, hr in zip(out_src, out_r):
        assert [h.chunk.id for h in hs] == [h.chunk.id for h in hr]
        assert [h.score for h in hs] == [h.score for h in hr]

    # ...but a post-restore in-place mutation invalidates the staged planes
    # (falls back to host re-quantization, never saves stale planes)
    live = next(c for c in chunks if c.embedding is not None)
    eng.device_index.update_embedding(
        live.id, [float(i) for i in range(DIM)]
    )
    save_snapshot(restored_store, tmp_path / "s3", device_index=eng.device_index)
    meta3 = json.loads(
        (tmp_path / "s3" / "snapshot.d" / "meta.json").read_text()
    )
    assert meta3["slabs"]["deriv"] == "host"


def test_slab_restore_rejects_unsound_quantization(tmp_path):
    """A quantization plane whose stored error bound understates the true
    residual (or carries NaN) must fail the integrity sample and fall back
    to the rebuild path."""
    import numpy as np

    from omni_recall_tpu.index.snapshot import load_snapshot_full

    rng = random.Random(11)
    store, vocab = _build_store(rng)
    src, chunks = _engine_with_store(store)
    save_snapshot(store, tmp_path / "s", device_index=src.device_index)
    restored_store, aux = load_snapshot_full(tmp_path / "s")

    def restore_with(key, mutate):
        aux_bad = dict(aux)
        aux_bad["slabs"] = dict(aux["slabs"])
        arr = np.array(aux["slabs"][key])
        mutate(arr)
        aux_bad["slabs"][key] = arr
        eng = _int8_engine()
        eng.store = restored_store
        restore_engine(restored_store, eng, aux=aux_bad)
        return eng

    # understated error bound: residual norm check must reject
    def shrink(e1):
        e1[:] = 0.0

    eng = restore_with("e1", shrink)
    assert eng.device_index._preconverted is None
    assert eng.device_index.n_rows == len(chunks)

    # NaN scale: must reject (NaN comparisons cannot sneak through)
    def poison(s1):
        s1[5] = np.nan

    eng2 = restore_with("s1", poison)
    assert eng2.device_index._preconverted is None

    # corrupted q1 row values: residual blows past the bound
    def corrupt(q1):
        q1[2] = 127

    eng3 = restore_with("q1", corrupt)
    assert eng3.device_index._preconverted is None

    reqs = _queries(rng, vocab)
    out_src = src.search_batch(reqs, now=NOW)
    out_x = eng.search_batch(reqs, now=NOW)
    for hs, hx in zip(out_src, out_x):
        assert [h.chunk.id for h in hs] == [h.chunk.id for h in hx]
        assert [h.score for h in hs] == [h.score for h in hx]


def test_save_device_planes_subset_rows(tmp_path):
    """Device-plane save with tombstoned rows (store covers a SUBSET of
    index rows): the on-device gather must pick exactly the live rows and
    the restore must reproduce the source engine's results."""
    import json

    rng = random.Random(13)
    store, vocab = _build_store(rng)
    src, chunks = _engine_with_store(store)
    # tombstone one document, then re-sync so the device snapshot is
    # current (the save's device path requires no pending dirty blocks)
    store.delete_document("doc_1")
    src.device_index.delete_document("doc_1")
    src.device_index.device_arrays()

    from omni_recall_tpu.index.snapshot import load_snapshot_full

    save_snapshot(store, tmp_path / "s", device_index=src.device_index)
    meta = json.loads(
        (tmp_path / "s" / "snapshot.d" / "meta.json").read_text()
    )
    assert meta["slabs"]["deriv"] == "device"

    restored_store, aux = load_snapshot_full(tmp_path / "s")
    assert aux["slabs"]["q1"].shape[0] == 20  # 3 docs x 10 minus doc_1
    eng = _int8_engine()
    eng.store = restored_store
    restore_engine(restored_store, eng, aux=aux)
    assert eng.device_index._preconverted is not None

    reqs = _queries(rng, vocab)
    out_src = src.search_batch(reqs, now=NOW)
    out_r = eng.search_batch(reqs, now=NOW)
    for hs, hr in zip(out_src, out_r):
        assert [h.chunk.id for h in hs] == [h.chunk.id for h in hr]
        assert [h.score for h in hs] == [h.score for h in hr]


def test_slab_restore_rejects_tampered_recency_and_arena(tmp_path):
    """The integrity sample must also cover the recency column (a stale
    `created` understates the scan's upper bound -> unsound certificate),
    the tie-break timestamps, and the lowercased content arena (exact
    keyword rescore input); malformed shapes must degrade to the rebuild
    instead of raising out of restore_engine."""
    import numpy as np

    from omni_recall_tpu.index.snapshot import load_snapshot_full

    rng = random.Random(7)
    store, vocab = _build_store(rng)
    src = _int8_engine()
    src.store = store
    chunks = []
    for doc in store.list_documents(1 << 30):
        chunks.extend(store.get_chunks_by_document_id(doc.id))
    chunks.sort(key=lambda c: c.seq)
    src.device_index.append(chunks)
    save_snapshot(store, tmp_path / "s", device_index=src.device_index)
    restored_store, aux = load_snapshot_full(tmp_path / "s")

    def tampered(key, mutate):
        bad = dict(aux)
        bad["slabs"] = dict(aux["slabs"])
        arr = np.array(aux["slabs"][key])
        mutate(arr)
        bad["slabs"][key] = arr
        return bad

    def older_day(a):
        a[5] -= 30.0  # pretend row 5 is 30 days older

    def shift_ts(a):
        a[5] += 1.0

    def flip_byte(a):
        a[1] ^= 0x20

    cases = [
        tampered("created", older_day),
        tampered("created_ts", shift_ts),
        tampered("lower_arena", flip_byte),
    ]
    # malformed: truncated created column (shape error must NOT escape)
    bad_shape = dict(aux)
    bad_shape["slabs"] = dict(aux["slabs"])
    bad_shape["slabs"]["created"] = np.array(aux["slabs"]["created"])[:-2]
    cases.append(bad_shape)
    # malformed offsets: lower_off not covering the arena
    bad_off = dict(aux)
    bad_off["slabs"] = dict(aux["slabs"])
    off = np.array(aux["slabs"]["lower_off"])
    off[-1] += 7
    bad_off["slabs"]["lower_off"] = off
    cases.append(bad_off)

    reqs = _queries(rng, vocab)
    out_src = src.search_batch(reqs, now=NOW)
    for bad_aux in cases:
        eng = _int8_engine()
        eng.store = restored_store
        restore_engine(restored_store, eng, aux=bad_aux)
        assert eng.device_index._preconverted is None  # rebuild path used
        assert eng.device_index.n_rows == len(chunks)
        out_x = eng.search_batch(reqs, now=NOW)
        for hs, hx in zip(out_src, out_x):
            assert [h.chunk.id for h in hs] == [h.chunk.id for h in hx]
            assert [h.score for h in hs] == [h.score for h in hx]


def test_restore_orders_doc_chunks_by_chunk_index(tmp_path):
    """A document whose chunk id was replaced mid-list gets a fresh seq for
    that chunk; the restored store must still return the doc's chunks in
    chunk_index order (store contract, InMemoryIngestionStore.cs:17-25)."""
    store = InMemoryIngestionStore()
    store.upsert_document(
        DocumentRecord(
            id="doc_x", file_name="x.txt", content_hash="hx",
            chunk_count=5, created_at_utc=T0,
        )
    )
    mk = lambda cid, i: ChunkRecord(  # noqa: E731
        id=cid, document_id="doc_x", chunk_index=i, content=f"content {i}",
        embedding=hash_embedder.embed_text(f"x-{i}", DIM),
        created_at_utc=T0 + timedelta(minutes=i),
    )
    store.upsert_chunks([mk(f"doc_x:{i:04d}", i) for i in range(5)])
    # replace chunk_index 2 under a NEW id (fresh seq; others keep theirs)
    store.upsert_chunks(
        [mk("doc_x:0002-v2" if i == 2 else f"doc_x:{i:04d}", i) for i in range(5)]
    )
    assert [c.chunk_index for c in store.get_chunks_by_document_id("doc_x")] == [
        0, 1, 2, 3, 4
    ]

    save_snapshot(store, tmp_path / "s")
    restored = load_snapshot(tmp_path / "s")
    got = restored.get_chunks_by_document_id("doc_x")
    assert [c.chunk_index for c in got] == [0, 1, 2, 3, 4]
    assert [c.id for c in got] == [
        "doc_x:0000", "doc_x:0001", "doc_x:0002-v2", "doc_x:0003", "doc_x:0004"
    ]


def test_snapshot_cross_topology_single_and_sharded(tmp_path):
    """Durability x sharding: a snapshot taken on ONE device restores into
    an 8-shard engine (the scale-up scenario) and back, with bit-identical
    rankings — the v3 slab planes re-shard at upload (_put row-shards any
    staged plane, including the device-exact-cosine raw plane)."""
    from omni_recall_tpu.index.snapshot import load_snapshot_full
    from omni_recall_tpu.parallel.mesh import shards_mesh

    rng = random.Random(9)
    store, vocab = _build_store(rng)
    mesh = shards_mesh(8)

    def dd_engine(mesh=None):
        return RecallEngine(
            InMemoryIngestionStore(),
            options=EngineOptions(
                backend="pallas", embedding_dim=DIM, recent_window=0,
                candidate_m=16, bloom_bits=256, scan_dtype="int8",
                capacity_block=512, refine=True, device_exact_cos=True,
            ),
            mesh=mesh,
        )

    src = dd_engine()
    src.store = store
    chunks = []
    for doc in store.list_documents(1 << 30):
        chunks.extend(store.get_chunks_by_document_id(doc.id))
    chunks.sort(key=lambda c: c.seq)
    src.device_index.append(chunks)

    save_snapshot(store, tmp_path / "s", device_index=src.device_index)
    restored_store, aux = load_snapshot_full(tmp_path / "s")
    sharded = dd_engine(mesh=mesh)
    sharded.store = restored_store
    restore_engine(restored_store, sharded, aux=aux)
    assert sharded.device_index.n_rows == len(chunks)
    assert sharded.device_index.device_arrays().raw is not None

    reqs = _queries(rng, vocab)
    out_src = src.search_batch(reqs, now=NOW)
    out_sh = sharded.search_batch(reqs, now=NOW)
    for hs, hh in zip(out_src, out_sh):
        assert [h.chunk.id for h in hs] == [h.chunk.id for h in hh]
        assert [h.score for h in hs] == [h.score for h in hh]

    # and back: snapshot the live SHARDED index, restore single-device
    save_snapshot(
        restored_store, tmp_path / "s2", device_index=sharded.device_index
    )
    st2, aux2 = load_snapshot_full(tmp_path / "s2")
    single = dd_engine()
    single.store = st2
    restore_engine(st2, single, aux=aux2)
    out_1 = single.search_batch(reqs, now=NOW)
    for hs, h1 in zip(out_src, out_1):
        assert [h.chunk.id for h in hs] == [h.chunk.id for h in h1]
        assert [h.score for h in hs] == [h.score for h in h1]


def test_upload_slabbed_tick_and_abort():
    """Long full-index uploads tick device_index.UPLOAD_TICK at every slab
    boundary so a deadline-aware caller (bench.py st_restore) can abort
    cleanly mid-upload instead of overrunning its budget (VERDICT r4 #2)."""
    import numpy as np

    from omni_recall_tpu.index import device_index as dix_mod

    host = np.arange(64 * 32, dtype=np.float32).reshape(64, 32)
    ticks = []
    dix_mod.UPLOAD_TICK = lambda: ticks.append(1)
    try:
        # tiny slab_bytes forces many slabs; result must be bit-identical
        out = np.asarray(dix_mod._upload_slabbed(host, slab_bytes=host.itemsize * 32 * 8))
        assert np.array_equal(out, host)
        assert len(ticks) == 8  # one tick per slab

        class Abort(RuntimeError):
            pass

        calls = {"n": 0}

        def tick():
            calls["n"] += 1
            if calls["n"] >= 3:
                raise Abort("deadline")

        dix_mod.UPLOAD_TICK = tick
        try:
            dix_mod._upload_slabbed(host, slab_bytes=host.itemsize * 32 * 8)
        except Abort:
            pass
        else:  # pragma: no cover
            raise AssertionError("tick abort did not propagate")
        assert calls["n"] == 3
    finally:
        dix_mod.UPLOAD_TICK = None
    # the hook is off by default and the fast single-slab path skips it
    ticks.clear()
    out = np.asarray(dix_mod._upload_slabbed(host))
    assert np.array_equal(out, host) and not ticks
