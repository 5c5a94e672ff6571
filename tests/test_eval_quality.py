"""Retrieval QUALITY campaign (VERDICT r2 weak #5): recall@10 per embedding
provider on the shared parity corpus/case set (eval/quality.py).

The trained local encoder must beat the hash baseline — the parity
campaign proves the device ranks exactly like the oracle; this proves the
rankings are WORTH producing, and that the train-your-own-memory-embedder
workflow actually lifts retrieval on the target corpus."""

from __future__ import annotations

from omni_recall_tpu.eval.quality import evaluate_embedders


def test_trained_encoder_beats_hash_baseline():
    results = evaluate_embedders(steps=150)
    # the hash baseline replicates the parity campaign's ~0.87 hit rate
    assert results["hash"] >= 0.8, results
    # an untrained encoder is near-chance; training on the corpus must lift
    # it decisively past both
    assert results["local-trained"] > results["local-untrained"], results
    assert results["local-trained"] >= results["hash"], results
