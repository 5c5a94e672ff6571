"""POST /api/documents/train (VERDICT r4 #6): the 0.96-class recall@10
quality path must be reachable from the API alone — no manual
tools/train_embedder_demo.py step. The route fine-tunes the LOCAL encoder
on the ingested corpus (inverse-cloze, models/finetune.py — the exact
procedure the real-corpus campaign measures) and re-embeds everything
through the reindex path (reference re-embed + swap semantics,
DocumentIngestionService.cs:220-291).

The quality test ingests real stdlib-documentation prose through the
NORMAL upload route, measures recall@10 through the NORMAL search route
before and after POST /api/documents/train, and asserts the trained
encoder retrieves better than the untrained one.
"""

from __future__ import annotations

from omni_recall_tpu.config import load_config
from omni_recall_tpu.eval import real_corpus
from omni_recall_tpu.ingest.embedding import LocalEncoderEmbeddingClient
from omni_recall_tpu.models.encoder import EncoderConfig
from omni_recall_tpu.server.app import build_app
from omni_recall_tpu.server.testing import TestClient

SUBSET = ["json", "argparse", "re", "csv", "heapq", "textwrap"]
DIM = 64

_CFG = EncoderConfig(
    vocab_size=4096, d_model=64, n_layers=2, n_heads=4, d_ff=128,
    max_len=48, out_dim=DIM,
)

_OVERRIDES = {
    "Embeddings:Provider": "Local",
    "Embeddings:Dim": DIM,
    "Embeddings:DeviceQuery": False,  # keep the CPU test light
    "Engine:EmbeddingDim": DIM,
    "Engine:Backend": "xla",
    "Engine:CapacityBlock": 512,
}


def _local_app():
    config = load_config(settings_file=None, env={}, overrides=_OVERRIDES)
    client = LocalEncoderEmbeddingClient(DIM, cfg=_CFG)
    app = build_app(config, embedding_client=client)
    return app, TestClient(app)


def _subset_docs():
    keep = {f"{m}.txt" for m in SUBSET}
    return [(f, t) for f, t in real_corpus.build_documents() if f in keep]


def _subset_queries():
    keep = {f"{m}.txt" for m in SUBSET}
    return [(q, e) for q, e in real_corpus.QUERIES if e in keep]


def _recall_at_10(client: TestClient, queries) -> float:
    hits = 0
    for question, expected in queries:
        resp = client.post(
            "/api/recall/search", json_body={"query": question, "topK": 10}
        )
        assert resp.status == 200
        files = {c["fileName"] for c in resp.json()["citations"]}
        hits += expected in files
    return hits / len(queries)


def test_train_route_improves_recall_and_reembeds():
    app, client = _local_app()
    docs = _subset_docs()
    for file_name, text in docs:
        resp = client.upload(
            "/api/documents/upload",
            filename=file_name,
            data=text.encode("utf-8"),
            fields={"sourceType": "file"},
        )
        assert resp.status == 201, resp.body

    queries = _subset_queries()
    assert len(queries) >= 8
    before = _recall_at_10(client, queries)

    resp = client.post("/api/documents/train", json_body={"steps": 120})
    assert resp.status == 200, resp.body
    body = resp.json()
    assert body["documentCount"] == len(docs)
    assert body["chunkCount"] > len(docs)  # multi-chunk documents
    assert body["embeddedCount"] == body["chunkCount"]
    assert body["failedCount"] == 0
    assert body["steps"] == 120
    assert "trained" in body["model"]

    after = _recall_at_10(client, queries)
    # the campaign's full-corpus numbers: untrained 0.647 -> trained 0.961.
    # The subset is easier, but the trained encoder must clearly beat the
    # untrained one and retrieve most queries outright.
    assert after > before, (before, after)
    assert after >= 0.7, (before, after)

    # the hot-swap reached the serving client (not just the response body)
    assert "trained-120" in app.embedding_client.model


def test_train_route_conflicts_without_local_provider():
    config = load_config(
        settings_file=None, env={},
        overrides={"Engine:EmbeddingDim": 3, "Engine:Backend": "xla"},
    )
    app = build_app(config)  # default Embeddings:Provider=None (NoOp)
    client = TestClient(app)
    resp = client.post("/api/documents/train", json_body={})
    assert resp.status == 409
    assert "not trainable" in resp.json()["title"]


def test_train_route_rejects_empty_corpus_and_bad_steps():
    app, client = _local_app()
    resp = client.post("/api/documents/train", json_body={})
    assert resp.status == 400  # nothing ingested yet
    resp = client.post("/api/documents/train", json_body={"steps": 0})
    assert resp.status == 400
    resp = client.post("/api/documents/train", json_body={"steps": "many"})
    assert resp.status == 400
