"""Fused Pallas kernel vs the pure-XLA scorer: identical candidates and
matching upper bounds on the same inputs (interpret mode on CPU; the same
code path compiles natively on TPU)."""

import random
import string
from datetime import datetime, timedelta, timezone

import jax.numpy as jnp
import numpy as np
import pytest

from omni_recall_tpu.config import EngineOptions
from omni_recall_tpu.index.device_index import DeviceIndex, to_days
from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord
from omni_recall_tpu.index.store import InMemoryIngestionStore
from omni_recall_tpu.models import hash_embedder
from omni_recall_tpu.ops import hashing, oracle, pallas_scorer, xla_scorer
from omni_recall_tpu.search.engine import RecallEngine

DIM = 128
T0 = datetime(2026, 8, 1, tzinfo=timezone.utc)
NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)


def _random_inputs(rng, n=256, b=4, bloom_bits=256):
    w = bloom_bits // 8
    emb = rng.standard_normal((n, DIM)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb[rng.random(n) < 0.1] = 0.0  # missing embeddings
    bloom = (rng.random((n, w)) < 0.4).astype(np.uint8)
    for b_i in range(1, 8):
        bloom |= ((rng.random((n, w)) < 0.3).astype(np.uint8) << b_i)
    created = (rng.random(n) * 100).astype(np.float32)
    created.sort()
    valid = rng.random(n) > 0.15
    q = rng.standard_normal((b, DIM)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    kw_w = np.zeros((b, bloom_bits), dtype=np.float32)
    for i in range(b):
        idx = rng.choice(bloom_bits, size=24, replace=False)
        kw_w[i, idx] = rng.random(24).astype(np.float32) * 0.1
    kw_b = rng.random(b).astype(np.float32) * 0.05
    return emb, bloom, created, valid, q, kw_w, kw_b


def test_pallas_matches_xla_scorer():
    rng = np.random.default_rng(13)
    for trial in range(3):
        emb, bloom, created, valid, q, kw_w, kw_b = _random_inputs(rng)
        args = (
            jnp.asarray(emb), jnp.asarray(bloom), jnp.asarray(created),
            jnp.asarray(valid), jnp.asarray(q), jnp.asarray(kw_w),
            jnp.asarray(kw_b), jnp.float32(50.0), jnp.int32(10),
        )
        v_x, i_x = xla_scorer.score_topm(*args, m=32)
        v_p, i_p = pallas_scorer.score_topm(*args, m=32, interpret=True)
        np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_p))
        # pallas carries a larger certificate margin (bf16-pass matmuls on
        # real hardware); in interpret mode the difference is exactly that
        # constant shift on live entries
        shift = pallas_scorer.PALLAS_CERT_EPS - xla_scorer.CERT_EPS
        v_x, v_p = np.asarray(v_x), np.asarray(v_p)
        live = np.isfinite(v_x)
        np.testing.assert_allclose(v_p[live], v_x[live] + shift, atol=2e-6, rtol=0)
        assert np.array_equal(live, np.isfinite(v_p))


def test_pallas_masks_invalid_and_window_rows():
    rng = np.random.default_rng(17)
    emb, bloom, created, valid, q, kw_w, kw_b = _random_inputs(rng, n=128, b=2)
    valid[:] = True
    valid[5] = False
    args = (
        jnp.asarray(emb), jnp.asarray(bloom), jnp.asarray(created),
        jnp.asarray(valid), jnp.asarray(q), jnp.asarray(kw_w),
        jnp.asarray(kw_b), jnp.float32(50.0), jnp.int32(64),
    )
    v, i = pallas_scorer.score_topm(*args, m=127, interpret=True)
    i, v = np.asarray(i), np.asarray(v)
    live = v > -np.inf
    assert set(i[live].tolist()) <= set(range(64, 128))
    assert live.sum(axis=1).max() == 64


def test_engine_pallas_backend_parity_vs_oracle():
    rng = random.Random(29)
    store = InMemoryIngestionStore()
    engine = RecallEngine(
        store,
        options=EngineOptions(
            backend="pallas", embedding_dim=DIM, capacity_block=128,
            candidate_m=16, bloom_bits=256,
        ),
    )
    oracle_engine = RecallEngine(store, None, EngineOptions(backend="oracle"))
    vocab = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 8))) for _ in range(50)]
    store.upsert_document(DocumentRecord(id="d", file_name="d.txt", created_at_utc=T0))
    chunks = [
        ChunkRecord(
            id=f"d:{i:04d}", document_id="d", chunk_index=i,
            content=" ".join(rng.choices(vocab, k=rng.randint(4, 20))),
            embedding=hash_embedder.embed_text(f"c{i}", DIM) if rng.random() > 0.1 else None,
            created_at_utc=T0 + timedelta(minutes=i),
        )
        for i in range(90)
    ]
    store.upsert_chunks(chunks)
    engine.on_chunks_upserted(chunks, new=True)

    for trial in range(6):
        query = " ".join(rng.choices(vocab, k=rng.randint(1, 3)))
        q_emb = hash_embedder.embed_text(query, DIM)
        hits = engine.search(query, q_emb, 8, now=NOW)
        expected = oracle_engine.search(query, q_emb, 8, now=NOW)
        assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]
        for a, b in zip(hits, expected):
            assert a.score == b.score
