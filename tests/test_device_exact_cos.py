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


def test_dd_certify_batch_matches_scalar_reference():
    """The vectorized batch certification (engine._dd_certify_batch) must
    classify every query exactly as the per-query scalar loop it replaced:
    same provable-failure set, same resolved set (and hence the same
    escalation set). Randomized segments probe empty/short/long candidate
    lists, exact zero-margin ties, boundary-straddling margins, and
    round4 midpoints."""
    import numpy as np

    from omni_recall_tpu.ops.exact_cos import round4_certified
    from omni_recall_tpu.search.engine import _dd_certify_batch

    def scalar_reference(scores_s, margins_s, seg, lens, k_arr, bnd):
        p = len(lens)
        resolved = np.zeros(p, dtype=bool)
        provable = np.zeros(p, dtype=bool)
        for pi in range(p):
            k = int(k_arr[pi])
            s = scores_s[seg[pi]: seg[pi + 1]]
            mg = margins_s[seg[pi]: seg[pi + 1]]
            boundary = bnd[pi]
            kk = min(k, len(s))
            if boundary != -np.inf:
                # upper bound on the exact kth: kth largest of s+m
                uk = -np.inf if len(s) < k else np.sort(s + mg)[::-1][k - 1]
                if len(s) < k or uk <= boundary:
                    provable[pi] = True
                    continue
                if not (s[k - 1] - mg[k - 1] > boundary):
                    continue  # escalate
            ok = True
            for j in range(min(kk, len(s) - 1)):
                gap_ok = s[j] - s[j + 1] > mg[j] + mg[j + 1]
                tie_ok = s[j] == s[j + 1] and mg[j] == 0.0 and mg[j + 1] == 0.0
                if not (gap_ok or tie_ok):
                    ok = False
                    break
            if ok and len(s) > kk and kk >= 1:
                tail_s, tail_m = s[kk:], mg[kk:]
                lead = s[kk - 1] - mg[kk - 1]
                bad = ~(
                    (lead > tail_s + tail_m)
                    | ((tail_s == s[kk - 1]) & (tail_m == 0.0)
                       & (mg[kk - 1] == 0.0))
                )
                if bad.any():
                    ok = False
            if ok and not round4_certified(s[:kk], mg[:kk]).all():
                ok = False
            resolved[pi] = ok
        return resolved, provable

    rng = np.random.default_rng(20260819)
    for trial in range(200):
        p = int(rng.integers(1, 12))
        lens = rng.integers(0, 24, size=p)
        if lens.sum() == 0:
            lens[rng.integers(p)] = 1
        total = int(lens.sum())
        # clustered scores with frequent exact ties and near-boundary gaps
        base = np.round(rng.uniform(0.0, 1.0, size=total), 3)
        jitter = rng.choice(
            [0.0, 1e-12, 5e-5, 2.5e-5], size=total, p=[0.5, 0.2, 0.2, 0.1]
        )
        scores = base + jitter
        margins = rng.choice(
            [0.0, 1e-13, 3e-5, 1e-4], size=total, p=[0.35, 0.35, 0.2, 0.1]
        )
        seg = np.zeros(p + 1, dtype=np.int64)
        np.cumsum(lens, out=seg[1:])
        # descending within each segment (the caller's lexsort invariant)
        for pi in range(p):
            sl = slice(seg[pi], seg[pi + 1])
            order = np.argsort(-scores[sl], kind="stable")
            scores[sl] = scores[sl][order]
            margins[sl] = margins[sl][order]
        k_arr = rng.integers(1, 12, size=p)
        bnd = np.where(
            rng.random(p) < 0.25,
            -np.inf,
            np.round(rng.uniform(0.0, 1.1, size=p), 2),
        )
        got_res, got_prov, got_kk = _dd_certify_batch(
            scores, margins, seg, lens.astype(np.int64),
            k_arr.astype(np.int64), bnd,
        )
        want_res, want_prov = scalar_reference(
            scores, margins, seg, lens, k_arr, bnd
        )
        np.testing.assert_array_equal(got_prov, want_prov, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(got_res, want_res, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(got_kk, np.minimum(k_arr, lens))
