"""Fused Pallas kernel tests (interpret mode on CPU; the identical code path
compiles natively on TPU — verified in bench and on-chip smoke runs).

The kernel emits per-block top-T candidates + a per-block bound; exactness
comes from the engine certificate, so the key property tested here is
SOUNDNESS: every row excluded from the candidate set has true upper-bound
score <= the returned boundary."""

import random
import string
from datetime import datetime, timedelta, timezone

import jax.numpy as jnp
import numpy as np

from omni_recall_tpu.config import EngineOptions
from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord
from omni_recall_tpu.index.store import InMemoryIngestionStore
from omni_recall_tpu.models import hash_embedder
from omni_recall_tpu.ops import pallas_scorer, xla_scorer
from omni_recall_tpu.search.engine import RecallEngine

DIM = 128
T0 = datetime(2026, 8, 1, tzinfo=timezone.utc)
NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)


def _random_inputs(rng, n, b=4, bloom_bits=256):
    w = bloom_bits // 8
    emb = rng.standard_normal((n, DIM)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb[rng.random(n) < 0.1] = 0.0
    bloom = rng.integers(0, 256, size=(n, w), dtype=np.uint8)
    created = np.sort((rng.random(n) * 100).astype(np.float32))
    valid = rng.random(n) > 0.15
    q = rng.standard_normal((b, DIM)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    kw_w = np.zeros((b, bloom_bits), dtype=np.float32)
    for i in range(b):
        idx = rng.choice(bloom_bits, size=24, replace=False)
        kw_w[i, idx] = rng.random(24).astype(np.float32) * 0.1
    kw_b = rng.random(b).astype(np.float32) * 0.05
    return emb, bloom, created, valid, q, kw_w, kw_b


def test_boundary_soundness_vs_exact_scores():
    rng = np.random.default_rng(13)
    n, b, m, t = 2048, 4, 24, 16  # 2 blocks of 1024 -> 32 candidates emitted
    emb, bloom, created, valid, q, kw_w, kw_b = _random_inputs(rng, n, b)
    args = (
        jnp.asarray(emb), jnp.asarray(bloom), jnp.asarray(created),
        jnp.asarray(valid), jnp.asarray(q), jnp.asarray(kw_w),
        jnp.asarray(kw_b), jnp.float32(50.0), jnp.int32(100),
    )
    vals, idxs = pallas_scorer.score_topm(*args, m=m, t=t, interpret=True)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    # exact (f32, HIGHEST precision) scores without any certificate margin
    exact = np.asarray(
        xla_scorer.ub_scores(*args)
    ) - xla_scorer.CERT_EPS  # [B, n]

    for bi in range(b):
        cands = set(idxs[bi, :m][vals[bi, :m] > -np.inf].tolist())
        boundary = vals[bi, m]
        assert idxs[bi, m] == -1
        for row in range(n):
            if row not in cands and np.isfinite(exact[bi, row]):
                assert exact[bi, row] <= boundary + 1e-6, (bi, row)
        # candidates carry their own (margined) scores
        for j in range(m):
            if vals[bi, j] > -np.inf:
                row = idxs[bi, j]
                assert vals[bi, j] >= exact[bi, row] - 1e-6


def test_masking_window_and_invalid_rows():
    rng = np.random.default_rng(17)
    n, b = 1024, 2
    emb, bloom, created, valid, q, kw_w, kw_b = _random_inputs(rng, n, b)
    valid[:] = True
    valid[700] = False
    args = (
        jnp.asarray(emb), jnp.asarray(bloom), jnp.asarray(created),
        jnp.asarray(valid), jnp.asarray(q), jnp.asarray(kw_w),
        jnp.asarray(kw_b), jnp.float32(50.0), jnp.int32(512),
    )
    vals, idxs = pallas_scorer.score_topm(*args, m=16, t=16, interpret=True)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    live = vals[:, :16] > -np.inf
    assert live.any()
    rows = idxs[:, :16][live]
    assert rows.min() >= 512
    assert 700 not in set(rows.tolist())


def test_m_exceeding_block_capacity_raises():
    rng = np.random.default_rng(19)
    emb, bloom, created, valid, q, kw_w, kw_b = _random_inputs(rng, 256, 2)
    args = (
        jnp.asarray(emb), jnp.asarray(bloom), jnp.asarray(created),
        jnp.asarray(valid), jnp.asarray(q), jnp.asarray(kw_w),
        jnp.asarray(kw_b), jnp.float32(50.0), jnp.int32(0),
    )
    try:
        pallas_scorer.score_topm(*args, m=64, t=8, interpret=True)
        raised = False
    except ValueError:
        raised = True
    assert raised  # 256 rows -> 1-2 blocks * 8 < 64


def _seed_engine_corpus(store, rng, n_chunks):
    vocab = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 8))) for _ in range(50)]
    store.upsert_document(DocumentRecord(id="d", file_name="d.txt", created_at_utc=T0))
    chunks = [
        ChunkRecord(
            id=f"d:{i:04d}", document_id="d", chunk_index=i,
            content=" ".join(rng.choices(vocab, k=rng.randint(4, 20))),
            embedding=hash_embedder.embed_text(f"c{i}", DIM) if rng.random() > 0.1 else None,
            created_at_utc=T0 + timedelta(minutes=i),
        )
        for i in range(n_chunks)
    ]
    store.upsert_chunks(chunks)
    return vocab, chunks


def test_engine_pallas_backend_parity_vs_oracle():
    rng = random.Random(29)
    store = InMemoryIngestionStore()
    engine = RecallEngine(
        store,
        options=EngineOptions(
            backend="pallas", embedding_dim=DIM, capacity_block=128,
            candidate_m=16, bloom_bits=256, recent_window=0,
        ),
    )
    oracle_engine = RecallEngine(store, None, EngineOptions(backend="oracle", recent_window=0))
    vocab, chunks = _seed_engine_corpus(store, rng, 600)  # cap 640 -> 5 blocks
    engine.on_chunks_upserted(chunks, new=True)

    for trial in range(5):
        query = " ".join(rng.choices(vocab, k=rng.randint(1, 3)))
        q_emb = hash_embedder.embed_text(query, DIM)
        hits = engine.search(query, q_emb, 8, now=NOW)
        expected = oracle_engine.search(query, q_emb, 8, now=NOW)
        assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]
        for a, b in zip(hits, expected):
            assert a.score == b.score


def test_engine_pallas_falls_back_to_xla_on_tiny_index():
    rng = random.Random(31)
    store = InMemoryIngestionStore()
    engine = RecallEngine(
        store,
        options=EngineOptions(
            backend="pallas", embedding_dim=DIM, capacity_block=128,
            candidate_m=64, bloom_bits=256,
        ),
    )
    oracle_engine = RecallEngine(store, None, EngineOptions(backend="oracle"))
    vocab, chunks = _seed_engine_corpus(store, rng, 40)  # 1 block * 8 < m=64
    engine.on_chunks_upserted(chunks, new=True)
    query = " ".join(rng.choices(vocab, k=2))
    q_emb = hash_embedder.embed_text(query, DIM)
    hits = engine.search(query, q_emb, 10, now=NOW)
    expected = oracle_engine.search(query, q_emb, 10, now=NOW)
    assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]


def test_cert_eps_covers_two_operand_bf16_rounding():
    """Adversarial soundness: a legitimately unit-normalized f32 vector
    whose elements sit just below a bf16 rounding midpoint loses ~2^-8
    relative on EACH matmul operand; the self-cosine deficit (~0.0065)
    exceeded the old one-operand eps of 4e-3. PALLAS_CERT_EPS must cover
    the two-operand worst case."""
    import math as _math

    import jax.numpy as jnp

    from omni_recall_tpu.ops.pallas_scorer import PALLAS_CERT_EPS

    d = 768
    u = 1.0 / _math.sqrt(d)
    # bad value: just under the midpoint between two adjacent bf16 values
    ulp = 2.0 ** (_math.floor(_math.log2(u)) - 7)  # bf16: 7 mantissa bits
    v = _math.floor(u / ulp) * ulp + 0.499 * ulp
    q = np.full(d, v, dtype=np.float64)
    # solve the last element for exact unit norm (keeps 767 bad elements)
    q[-1] = _math.sqrt(max(0.0, 1.0 - float(np.sum(q[:-1] ** 2))))
    qf = q.astype(np.float32)
    norm = float(np.linalg.norm(qf.astype(np.float64)))
    assert abs(norm - 1.0) < 1e-6  # legitimate normalized input

    exact = float(np.dot(qf.astype(np.float64), qf.astype(np.float64)))
    qb = jnp.asarray(qf).astype(jnp.bfloat16)
    device = float(
        jnp.dot(qb, qb, preferred_element_type=jnp.float32)
    )
    deficit = exact - device
    # the adversarial deficit really does exceed the old 4e-3-per-0.7 margin
    assert 0.7 * deficit > 4e-3, deficit
    # ... and the current margin covers it with the keyword term's 1e-3
    assert 0.7 * deficit + 1e-3 < PALLAS_CERT_EPS, deficit


def test_certificate_detects_concurrent_embedding_update():
    """A reindex (in-place embedding update) landing between the device
    snapshot and the host rescore must NOT produce a 'certified' ranking
    mixing stale bounds with fresh scores — the engine detects the update
    via DeviceIndex.update_seq and serializes after it through the exact
    host scan."""
    rng = random.Random(77)
    store = InMemoryIngestionStore()
    engine = RecallEngine(
        store,
        options=EngineOptions(
            backend="pallas", embedding_dim=DIM, capacity_block=128,
            candidate_m=8, bloom_bits=256,
        ),
    )
    vocab, chunks = _seed_engine_corpus(store, rng, 200)
    engine.on_chunks_upserted(chunks, new=True)

    query = " ".join(rng.choices(vocab, k=2))
    q_emb = hash_embedder.embed_text(query, DIM)

    # inject an update between the scan and the rescore: wrap the rescore
    # entry point so the first call flips a chunk's embedding to be a
    # near-perfect match for the query
    target = chunks[0]
    original = engine._exact_rescore_rows
    fired = {"n": 0}

    def updating_rescore(*args, **kwargs):
        if fired["n"] == 0:
            fired["n"] = 1
            engine.on_chunks_upserted(
                [ChunkRecord(
                    id=target.id, document_id=target.document_id,
                    chunk_index=target.chunk_index, content=target.content,
                    embedding=q_emb, created_at_utc=target.created_at_utc,
                    seq=target.seq,
                )],
                new=False,
            )
        return original(*args, **kwargs)

    engine._exact_rescore_rows = updating_rescore
    try:
        hits = engine.search(query, q_emb, 5, now=NOW)
    finally:
        engine._exact_rescore_rows = original

    # exact vs the post-update state: the updated chunk must now rank first
    oracle_engine = RecallEngine(store, None, EngineOptions(backend="oracle"))
    expected = oracle_engine.search(query, q_emb, 5, now=NOW)
    assert [h.chunk.id for h in hits] == [h.chunk.id for h in expected]
    assert hits[0].chunk.id == target.id


def test_packed_key_emit_bit_identical_to_pair_emit():
    """The packed single-i32 emit (emit_keys=True) + XLA decode must be
    BIT-identical to the pair kernels' (vals, idxs) for every entry —
    candidates, bounds, masked rows — across windows and invalid rows
    (the decode runs the same decode_up/lane arithmetic the pair kernel
    runs in-kernel)."""
    from omni_recall_tpu.ops.quantize import quantize_rows_int8

    rng = np.random.default_rng(11)
    n, b = 1024, 8
    emb, bloom, created, valid, q, kw_w, kw_b = _random_inputs(rng, n, b=b)
    q8, scale, err = quantize_rows_int8(emb)
    for sub, t, r0 in ((64, 2, 0), (128, 3, 137), (256, 4, 0)):
        pair = pallas_scorer.score_topm_int8_coarse(
            jnp.asarray(q8), jnp.asarray(scale), jnp.asarray(err),
            jnp.asarray(created), jnp.asarray(valid), jnp.asarray(q),
            jnp.asarray(kw_w), jnp.asarray(kw_b),
            jnp.float32(100.0), jnp.int32(r0), m=16, t=t, sub=sub,
            interpret=True, emit_keys=False,
        )
        keys = pallas_scorer.score_topm_int8_coarse(
            jnp.asarray(q8), jnp.asarray(scale), jnp.asarray(err),
            jnp.asarray(created), jnp.asarray(valid), jnp.asarray(q),
            jnp.asarray(kw_w), jnp.asarray(kw_b),
            jnp.float32(100.0), jnp.int32(r0), m=16, t=t, sub=sub,
            interpret=True, emit_keys=True,
        )
        pv, pi = map(np.asarray, pair)
        kv, ki = map(np.asarray, keys)
        assert np.array_equal(pv, kv), (sub, t)
        assert np.array_equal(pi, ki), (sub, t)
    # non-pow2-compatible shapes (t=1 -> t1=2) silently fall back to the
    # pair emit: same results by construction
    a = pallas_scorer.score_topm_int8_coarse(
        jnp.asarray(q8), jnp.asarray(scale), jnp.asarray(err),
        jnp.asarray(created), jnp.asarray(valid), jnp.asarray(q),
        jnp.asarray(kw_w), jnp.asarray(kw_b),
        jnp.float32(100.0), jnp.int32(0), m=8, t=1, sub=128,
        interpret=True, emit_keys=True,
    )
    b_ = pallas_scorer.score_topm_int8_coarse(
        jnp.asarray(q8), jnp.asarray(scale), jnp.asarray(err),
        jnp.asarray(created), jnp.asarray(valid), jnp.asarray(q),
        jnp.asarray(kw_w), jnp.asarray(kw_b),
        jnp.float32(100.0), jnp.int32(0), m=8, t=1, sub=128,
        interpret=True, emit_keys=False,
    )
    assert np.array_equal(np.asarray(a[0]), np.asarray(b_[0]))
    assert np.array_equal(np.asarray(a[1]), np.asarray(b_[1]))


def test_transposed_key_emit_bit_identical_to_packed_emit():
    """The TRANSPOSED packed-key emit (emit_keys="t", the r5 engine
    default) must decode bit-identically to the packed emit — same key
    transform, same per-round max winners (keys are unique per position),
    same decode arithmetic — across layouts, windows and invalid rows.
    Aux inputs ride the standard [1, N]/[B, 1] layouts and transpose per
    block IN VMEM (a host-side [N, 1] reshape lane-pads 128x: measured
    5 GB per aux column and an HBM OOM at the 10M config)."""
    from omni_recall_tpu.ops.quantize import quantize_rows_int8

    rng = np.random.default_rng(13)
    n, b = 1024, 8
    emb, bloom, created, valid, q, kw_w, kw_b = _random_inputs(rng, n, b=b)
    q8, scale, err = quantize_rows_int8(emb)
    for sub, t, r0 in ((64, 2, 0), (128, 3, 137), (256, 4, 0)):
        packed = pallas_scorer.score_topm_int8_coarse(
            jnp.asarray(q8), jnp.asarray(scale), jnp.asarray(err),
            jnp.asarray(created), jnp.asarray(valid), jnp.asarray(q),
            jnp.asarray(kw_w), jnp.asarray(kw_b),
            jnp.float32(100.0), jnp.int32(r0), m=16, t=t, sub=sub,
            interpret=True, emit_keys=True,
        )
        keys_t = pallas_scorer.score_topm_int8_coarse(
            jnp.asarray(q8), jnp.asarray(scale), jnp.asarray(err),
            jnp.asarray(created), jnp.asarray(valid), jnp.asarray(q),
            jnp.asarray(kw_w), jnp.asarray(kw_b),
            jnp.float32(100.0), jnp.int32(r0), m=16, t=t, sub=sub,
            interpret=True, emit_keys="t",
        )
        assert np.array_equal(np.asarray(packed[0]), np.asarray(keys_t[0])), (sub, t)
        assert np.array_equal(np.asarray(packed[1]), np.asarray(keys_t[1])), (sub, t)
    # shapes the packed paths reject (t1 < 3) fall back to the pair emit
    for ek in ("t", True):
        f = pallas_scorer.score_topm_int8_coarse(
            jnp.asarray(q8), jnp.asarray(scale), jnp.asarray(err),
            jnp.asarray(created), jnp.asarray(valid), jnp.asarray(q),
            jnp.asarray(kw_w), jnp.asarray(kw_b),
            jnp.float32(100.0), jnp.int32(0), m=8, t=1, sub=128,
            interpret=True, emit_keys=ek,
        )
        g = pallas_scorer.score_topm_int8_coarse(
            jnp.asarray(q8), jnp.asarray(scale), jnp.asarray(err),
            jnp.asarray(created), jnp.asarray(valid), jnp.asarray(q),
            jnp.asarray(kw_w), jnp.asarray(kw_b),
            jnp.float32(100.0), jnp.int32(0), m=8, t=1, sub=128,
            interpret=True, emit_keys=False,
        )
        assert np.array_equal(np.asarray(f[0]), np.asarray(g[0]))
        assert np.array_equal(np.asarray(f[1]), np.asarray(g[1]))
