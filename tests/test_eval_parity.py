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

from dataclasses import asdict

from omni_recall_tpu.config import EngineOptions
from omni_recall_tpu.eval.corpus import (
    DIM,
    NOW,
    build_corpus as _build_corpus,
    generate_cases as _generate_cases,
)
from omni_recall_tpu.models import hash_embedder
from omni_recall_tpu.search.engine import RecallEngine
from omni_recall_tpu.search.service import RecallSearchService
from omni_recall_tpu.snippets import SEARCH_SNIPPET_LEN, build_snippet  # noqa: F401


class _HashProvider:
    def embed(self, text: str):
        class R:
            vector = hash_embedder.embed_text(text, DIM)
        return R()


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
