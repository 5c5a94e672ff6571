"""Round-3 serving-path additions: sparse keyword-weight upload + wide
rescue.

1. ``hashing.query_bit_weights_sparse_batch`` must reproduce the dense
   builder BIT-FOR-BIT after scattering (the engine scatters on device via
   _densify_kw; soundness of every keyword bound rests on the weights).
2. The engine's wide rescue: a compact-selection certificate miss (the
   (t_out+1)-th refined bound sits inside a co-located score cluster) is
   re-certified from the dispatch scan's full [B, m+1] candidates — one
   small gather/readback — without a fresh rescue scan, and the results
   stay oracle-identical.
"""

from datetime import datetime, timedelta, timezone

import numpy as np

from omni_recall_tpu.config import EngineOptions
from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord
from omni_recall_tpu.index.store import InMemoryIngestionStore
from omni_recall_tpu.models import hash_embedder
from omni_recall_tpu.ops import hashing
from omni_recall_tpu.search.engine import RecallEngine

DIM = 32
T0 = datetime(2026, 8, 1, tzinfo=timezone.utc)
NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)


def test_sparse_bit_weights_match_dense_builder():
    rng = np.random.default_rng(0)
    words = [
        "alpha", "beta2", "x", "topic", "c123x", "longer-term-with-dashes",
        "zz", "ünïcode", "naïve", "a" * 40,
    ]
    tls = [
        [words[j] for j in rng.integers(0, len(words), size=rng.integers(0, 5))]
        for _ in range(200)
    ]
    tls.append([])          # empty query
    tls.append(["ünïcode"])  # python-fallback row
    for bits, ng, nh in ((1024, 3, 2), (512, 3, 2), (1000, 3, 3)):
        dense_w, dense_b = hashing.query_bit_weights_batch(tls, bits, ng, nh)
        sp = hashing.query_bit_weights_sparse_batch(tls, bits, ng, nh)
        if sp is None:  # no native lib: the engine keeps the dense path
            return
        idx, val, bias = sp
        assert np.array_equal(bias, dense_b)
        rec = np.zeros((len(tls), bits), dtype=np.float32)
        for q in range(len(tls)):
            ok = idx[q] >= 0
            # unique indices per query: the device scatter-add relies on it
            assert len(np.unique(idx[q][ok])) == int(ok.sum())
            rec[q, idx[q][ok]] = val[q][ok]
        assert np.array_equal(rec, dense_w)


def _wide_rescue_corpus(n_bg=4048, cluster=48):
    """Background noise + one co-located score cluster: identical
    embeddings (cosine ties) separated only by recency (~2.3e-6/minute), so
    the 10th..33rd exact scores sit within the refined-bound slack and the
    compact certificate provably fails — while the full scan width's
    boundary (the 129th bound, cross-cluster) clears easily. Cluster rows
    are interleaved across append order so the per-slice extraction never
    drops them."""
    store = InMemoryIngestionStore()
    opts = EngineOptions(
        backend="pallas", embedding_dim=DIM, capacity_block=512,
        candidate_m=128, bloom_bits=256, recent_window=0,
        scan_dtype="int8", device_exact_cos=True,
    )
    engine = RecallEngine(store, options=opts)
    oracle_engine = RecallEngine(
        store, None, EngineOptions(backend="oracle", recent_window=0)
    )
    rng = np.random.default_rng(7)
    center = hash_embedder.embed_text("hotspot", DIM)
    store.upsert_document(
        DocumentRecord(id="d", file_name="d.txt", created_at_utc=T0)
    )
    n = n_bg + cluster
    step = n // cluster
    chunks = []
    placed = 0
    for i in range(n):
        if i % step == 0 and placed < cluster:
            content = "hotspot shared cluster note"
            emb = list(center)
            # cluster scores separated ONLY by recency, 20 s apart
            # (~4.7e-7/row, > 30x the DD ranking margins): the 10th..33rd
            # span ~1.1e-5, inside the refined bound's measured ~3e-5
            # slack at DIM=32 — the compact bound provably fails while the
            # full-width boundary (cross-cluster) clears
            created = T0 + timedelta(minutes=900, seconds=20 * placed)
            placed += 1
        else:
            content = f"background note b{i} {rng.integers(0, 1 << 30)}"
            emb = hash_embedder.embed_text(content, DIM)
            created = T0 + timedelta(minutes=i % 800)
        chunks.append(
            ChunkRecord(
                id=f"d:{i:05d}", document_id="d", chunk_index=i,
                content=content, embedding=emb,
                created_at_utc=created,
            )
        )
    store.upsert_chunks(chunks)
    engine.on_chunks_upserted(chunks, new=True)
    return engine, oracle_engine, center


def test_wide_rescue_resolves_compact_miss_without_rescan():
    engine, oracle_engine, center = _wide_rescue_corpus()
    got = engine.search("hotspot", list(center), 10, now=NOW)
    want = oracle_engine.search("hotspot", list(center), 10, now=NOW)
    assert [h.chunk.id for h in got] == [h.chunk.id for h in want]
    assert [h.score for h in got] == [h.score for h in want]
    # the compact miss was recovered from the dispatch scan's candidates:
    # no fresh rescue scan, no escalation round, no host fallback
    assert engine.stats["rescue_wide_total"] >= 1
    assert engine.stats["escalation_rounds_total"] == 0
    assert engine.stats["host_fallbacks_total"] == 0


def test_wide_rescue_mixed_batch_stays_exact():
    engine, oracle_engine, center = _wide_rescue_corpus()
    rng = np.random.default_rng(3)
    requests = [("hotspot", list(center), 10)]
    for i in range(7):
        qt = f"background note b{int(rng.integers(0, 4000))}"
        requests.append((qt, hash_embedder.embed_text(qt, DIM), 5))
    batch = engine.search_batch(requests, now=NOW)
    for (q, emb, k), hits in zip(requests, batch):
        want = oracle_engine.search(q, emb, k, now=NOW)
        assert [h.chunk.id for h in hits] == [h.chunk.id for h in want]
        assert [h.score for h in hits] == [h.score for h in want]
