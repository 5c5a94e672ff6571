"""Recall@10 parity campaign (BASELINE north star, VERDICT r1 #5).

>= 200 auto-generated eval cases over a multi-document corpus, executed
against BOTH backends — the host float64 oracle and the fused pallas+int8
device engine — asserting bit-identical citation lists at the DTO edge
(documentId, fileName, chunkId, chunkIndex, snippet, createdAtUtc, and the
score rounded to 4 decimals, RecallSearchService.cs:41-54), at topK=10.

Both services share one store/corpus and one frozen 'now', so any
divergence is attributable to the device path (quantization, kernel math,
candidate selection, certificate) — which the exactness certificate is
supposed to make impossible.
"""

import random
import string
from dataclasses import asdict
from datetime import datetime, timedelta, timezone

from omni_recall_tpu.config import EngineOptions
from omni_recall_tpu.eval.harness import EvalCase, to_topic
from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord
from omni_recall_tpu.index.store import InMemoryIngestionStore
from omni_recall_tpu.models import hash_embedder
from omni_recall_tpu.search.engine import RecallEngine
from omni_recall_tpu.search.service import RecallSearchService
from omni_recall_tpu.snippets import SEARCH_SNIPPET_LEN, build_snippet  # noqa: F401

DIM = 64
T0 = datetime(2026, 8, 1, tzinfo=timezone.utc)
NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)


class _HashProvider:
    def embed(self, text: str):
        class R:
            vector = hash_embedder.embed_text(text, DIM)
        return R()


def _build_corpus(n_docs=70, chunks_per_doc=6):
    """Multi-document corpus with topic structure AND noise: each document
    has a distinct topic phrase leading its chunks plus shared vocabulary,
    so retrieval has real signal and real confusion."""
    rng = random.Random(20260816)
    shared = [
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(3, 9)))
        for _ in range(120)
    ]
    store = InMemoryIngestionStore()
    seq = 0
    all_chunks = []
    for di in range(n_docs):
        doc_id = f"doc_{di:03d}"
        fname = f"notes-{di:03d}.md"
        topic = f"subject{di:03d} " + " ".join(rng.choices(shared, k=2))
        created = T0 + timedelta(hours=di)
        store.upsert_document(
            DocumentRecord(
                id=doc_id, file_name=fname, created_at_utc=created,
                chunk_count=chunks_per_doc,
            )
        )
        for ci in range(chunks_per_doc):
            body = " ".join(rng.choices(shared, k=rng.randint(10, 35)))
            content = f"{topic}. {body}" if ci == 0 else f"{topic} {body}"
            chunk = ChunkRecord(
                id=f"{doc_id}:{ci:04d}", document_id=doc_id, chunk_index=ci,
                content=content,
                embedding=hash_embedder.embed_text(content, DIM),
                created_at_utc=created + timedelta(minutes=ci),
            )
            seq += 1
            all_chunks.append(chunk)
        store.upsert_chunks(all_chunks[-chunks_per_doc:])
    return store, all_chunks


def _generate_cases(store, min_cases=200):
    """Auto-generation mirroring eval.page.ts:483-515: 3 question templates
    per document from the first chunk's leading sentence topic."""
    cases = []
    for doc in store.list_documents(10**6):
        chunks = sorted(
            store.get_chunks_by_document_id(doc.id), key=lambda c: c.chunk_index
        )
        if not chunks:
            continue
        topic = to_topic(chunks[0].content)
        for template in (
            f"What does the document say about {topic}?",
            f"Summarize the key points about {topic}.",
            f"Which details are recorded about {topic}?",
        ):
            cases.append(EvalCase(question=template, expected_file=doc.file_name, top_k=10))
    assert len(cases) >= min_cases, f"only {len(cases)} cases generated"
    return cases


def test_recall_at_10_parity_campaign_oracle_vs_pallas_int8():
    store, chunks = _build_corpus()
    provider = _HashProvider()

    oracle_engine = RecallEngine(
        store, None, EngineOptions(backend="oracle", recent_window=0)
    )
    device_engine = RecallEngine(
        store,
        options=EngineOptions(
            backend="pallas", embedding_dim=DIM, capacity_block=512,
            candidate_m=16, bloom_bits=256, recent_window=0,
            scan_dtype="int8",
        ),
    )
    device_engine.on_chunks_upserted(chunks, new=True)

    svc_oracle = RecallSearchService(oracle_engine, provider)
    svc_device = RecallSearchService(device_engine, provider)

    cases = _generate_cases(store, min_cases=200)
    recall_hits = 0
    mismatches = []
    for case in cases:
        want = svc_oracle.search(case.question, case.top_k, now=NOW)
        got = svc_device.search(case.question, case.top_k, now=NOW)
        w = [asdict(c) for c in want.citations]
        g = [asdict(c) for c in got.citations]
        if w != g:
            mismatches.append((case.question, w[:2], g[:2]))
        if any(c.file_name == case.expected_file for c in want.citations):
            recall_hits += 1
    assert not mismatches, f"{len(mismatches)} DTO mismatches; first: {mismatches[0]}"
    # the campaign must also be a meaningful retrieval eval, not vacuous
    hit_rate = recall_hits / len(cases)
    assert hit_rate >= 0.8, f"recall@10 hit rate {hit_rate:.3f} too low for signal"
