"""Engine:DirectSelect — compact selection straight from the scan bounds.

The serving fast path (VERDICT r3 #2): skip the residual-int8 refine
gather + kernel and select the compact candidate slice directly from the
scan/merge output; the certificate bound becomes the (t_out+1)-th SCAN
bound (ops/refine.py direct_select_from_scan). Contract under test:

- the selection satisfies the compact coverage contract (bound covers the
  scan boundary AND every dropped candidate);
- end-to-end results stay oracle-identical, with and without the
  device-exact cosine stage, including on an index built WITHOUT residual
  planes (refine=False — the 10M single-chip capacity shape);
- the refine stage is genuinely skipped on the hot path, and certificate
  misses still escalate to an exact result (duplicate-row near-ties).
"""

import random
import string
from datetime import datetime, timedelta, timezone

import numpy as np

from omni_recall_tpu.config import EngineOptions
from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord
from omni_recall_tpu.index.store import InMemoryIngestionStore
from omni_recall_tpu.models import hash_embedder
from omni_recall_tpu.search.engine import RecallEngine

DIM = 32
T0 = datetime(2026, 8, 1, tzinfo=timezone.utc)
NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)


def test_direct_select_from_scan_coverage():
    import jax.numpy as jnp

    from omni_recall_tpu.ops.refine import direct_select_from_scan

    rng = np.random.default_rng(0)
    b, m = 5, 16
    vals = np.sort(rng.standard_normal((b, m)).astype(np.float32), axis=1)[:, ::-1]
    boundary = vals[:, -1] - rng.uniform(0.0, 0.5, size=b).astype(np.float32)
    vals_full = np.concatenate([vals, boundary[:, None]], axis=1)
    idxs_full = np.concatenate(
        [rng.permutation(m * 4)[:m][None, :].repeat(b, 0),
         np.full((b, 1), -1)], axis=1,
    ).astype(np.int32)
    t_out = 6
    rows, ubs, bound = map(
        np.asarray,
        direct_select_from_scan(jnp.asarray(vals_full), jnp.asarray(idxs_full), t_out),
    )
    assert rows.shape == (b, t_out) and ubs.shape == (b, t_out)
    assert (rows == idxs_full[:, :t_out]).all()
    assert (ubs == vals_full[:, :t_out]).all()
    # coverage: bound >= every value not in the slice (dropped candidates
    # AND the scan boundary)
    expect = np.maximum(vals_full[:, -1], vals_full[:, t_out])
    assert (bound == expect).all()
    assert (bound[:, None] >= vals_full[:, t_out:-1]).all()
    # t_out >= m degenerates to the whole candidate set + the boundary
    rows2, ubs2, bound2 = map(
        np.asarray,
        direct_select_from_scan(jnp.asarray(vals_full), jnp.asarray(idxs_full), m + 8),
    )
    assert rows2.shape == (b, m)
    assert (bound2 == vals_full[:, -1]).all()


def _build(rng, n=300, dup_pairs=0, dd=True, refine=True):
    store = InMemoryIngestionStore()
    engine = RecallEngine(
        store,
        options=EngineOptions(
            backend="pallas", scan_dtype="int8", embedding_dim=DIM,
            capacity_block=128, candidate_m=16, bloom_bits=256,
            recent_window=0, device_exact_cos=dd, refine=refine,
            direct_select=True,
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


def _requests(rng, vocab, count=12):
    reqs = []
    for i in range(count):
        query = " ".join(rng.choices(vocab, k=rng.randint(1, 3)))
        emb = (
            hash_embedder.embed_text(f"q{i}", DIM)
            if rng.random() < 0.75 else []
        )
        reqs.append((query, emb, rng.choice([1, 3, 10])))
    return reqs


def _assert_oracle_match(engine, oracle_engine, requests):
    batch = engine.search_batch(requests, now=NOW)
    for (query, emb, k), hits in zip(requests, batch):
        expected = oracle_engine.search(query, emb, k, now=NOW)
        assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]
        for h, e in zip(hits, expected):
            assert round(h.score, 4) == round(e.score, 4)


def test_direct_select_dd_matches_oracle_and_skips_refine(monkeypatch):
    from omni_recall_tpu.ops import refine as refine_mod

    calls = {"refine": 0}
    real = refine_mod.refine_select_from_scan

    def counting(*a, **kw):
        calls["refine"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(refine_mod, "refine_select_from_scan", counting)
    rng = random.Random(11)
    engine, oracle_engine, vocab, _ = _build(rng, dd=True)
    _assert_oracle_match(engine, oracle_engine, _requests(rng, vocab))
    # the hot path never dispatched the refine stage...
    assert calls["refine"] == 0
    # ...and the DD certificate still resolved on device
    assert engine.stats["dd_resolved_total"] > 0


def test_direct_select_host_path_matches_oracle():
    rng = random.Random(12)
    engine, oracle_engine, vocab, _ = _build(rng, dd=False)
    _assert_oracle_match(engine, oracle_engine, _requests(rng, vocab))
    assert engine.stats["coarse_resolved_total"] > 0


def test_direct_select_without_residual_planes():
    # refine=False: no residual planes exist at all (the 10M capacity
    # shape); direct select is then the ONLY compact path and must still
    # be oracle-exact through the host rescore
    rng = random.Random(13)
    engine, oracle_engine, vocab, _ = _build(rng, dd=False, refine=False)
    assert engine.device_index.device_arrays().emb2 is None
    _assert_oracle_match(engine, oracle_engine, _requests(rng, vocab))


def test_direct_gate_falls_back_to_refine_and_reprobes():
    # the adaptive gate: on corpora where the direct bounds keep missing
    # (rolling compact resolution < 0.9) the engine falls back to the
    # refine selection, then re-probes direct after the horizon. Results
    # are oracle-exact in every phase — the gate moves throughput only.
    rng = random.Random(15)
    engine, oracle_engine, vocab, _ = _build(rng, dd=True)
    reqs = [
        (" ".join(rng.choices(vocab, k=2)),
         hash_embedder.embed_text(f"g{i}", DIM), 5)
        for i in range(8)
    ]
    _assert_oracle_match(engine, oracle_engine, reqs)
    assert engine._last_select_direct is True  # gate open: direct served
    engine._direct_gate_record(0, 64)  # poison: a failing window
    assert not engine._direct_gate_open()
    _assert_oracle_match(engine, oracle_engine, reqs)
    assert engine._last_select_direct is False  # refine selection served
    engine._direct_gate_advance(4096)  # past the re-probe horizon
    _assert_oracle_match(engine, oracle_engine, reqs)
    assert engine._last_select_direct is True


def test_direct_select_duplicate_rows_escalate_and_stay_exact():
    rng = random.Random(14)
    engine, oracle_engine, vocab, chunks = _build(rng, n=300, dup_pairs=6)
    requests = [
        (chunks[j].content.split()[0], chunks[j].embedding, 5)
        for j in range(6)
    ]
    _assert_oracle_match(engine, oracle_engine, requests)
    assert engine.stats["dd_escalations_total"] > 0


def test_select_t_out_override_clamps_and_applies():
    # Engine:SelectTOut narrows the compact slice; it must clamp to cover
    # the requested k (+headroom) and stay oracle-exact
    rng = random.Random(16)
    engine, oracle_engine, vocab, _ = _build(rng, dd=True)
    engine.options.select_t_out = 8
    reqs = [
        (" ".join(rng.choices(vocab, k=2)),
         hash_embedder.embed_text(f"t{i}", DIM), 10)
        for i in range(6)
    ]
    _assert_oracle_match(engine, oracle_engine, reqs)
    # max_k=10 -> clamp to >= 14 -> pow2 16 (not the raw 8)
    from omni_recall_tpu.ops import refine as refine_mod

    sel, _ = engine._refine_select_call(
        engine.device_index.device_arrays(),
        None, None, None, None,
        __import__("jax.numpy", fromlist=["zeros"]).zeros((2, 17)),
        __import__("jax.numpy", fromlist=["zeros"]).zeros(
            (2, 17), dtype="int32"
        ),
        m=16, max_k=10,
    )
    assert sel[0].shape[1] == 15  # min(t_out=16, m-1=15)
