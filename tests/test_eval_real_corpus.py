"""Real-corpus quality campaign (eval/real_corpus.py, VERDICT r3 #5).

The full three-provider campaign is a tool run (tools/quality_real_corpus.py
— minutes of encoder fine-tuning); this test pins the harness itself on a
subset: real stdlib-documentation prose ingests through the NORMAL upload
path, and the hash provider retrieves the expected document for
natural-language questions at a sane rate.
"""

from __future__ import annotations

from omni_recall_tpu.eval import real_corpus
from omni_recall_tpu.models import hash_embedder

SUBSET = ["json", "argparse", "re", "csv", "heapq", "textwrap"]


def _subset_docs():
    keep = {f"{m}.txt" for m in SUBSET}
    return [(f, t) for f, t in real_corpus.build_documents() if f in keep]


def _subset_queries():
    keep = {f"{m}.txt" for m in SUBSET}
    return [(q, e) for q, e in real_corpus.QUERIES if e in keep]


def test_ingests_through_normal_upload_path():
    docs = _subset_docs()
    assert len(docs) == len(SUBSET)
    # real prose, not stubs
    assert all(len(t.split()) > 300 for _, t in docs)
    store = real_corpus.ingest_corpus(
        lambda t: hash_embedder.embed_text(t, real_corpus.DIM), docs=docs
    )
    listed = store.list_documents(100)
    assert {d.file_name for d in listed} == {f for f, _ in docs}
    # the chunker ran (120/24 words): multi-chunk documents with embeddings
    for d in listed:
        chunks = store.get_chunks_by_document_id(d.id)
        assert len(chunks) > 3
        assert all(len(c.embedding) == real_corpus.DIM for c in chunks)


def test_hash_provider_retrieves_real_prose():
    docs = _subset_docs()
    queries = _subset_queries()
    assert len(queries) >= 8
    rate = real_corpus.recall_at_10(
        lambda t: hash_embedder.embed_text(t, real_corpus.DIM),
        docs=docs, queries=queries,
    )
    # measured 0.88 on the full 42-module corpus; the subset is easier
    # (fewer distractors) — this floor catches harness breakage, not
    # quality regressions
    assert rate >= 0.6, rate
