"""Layered config tests."""

import json

from omni_recall_tpu.config import load_config


def test_code_defaults_mirror_reference_code():
    cfg = load_config(settings_file=None, env={})
    assert cfg.ai_routing.max_attempts_per_provider == 2
    assert cfg.ingestion.chunk_size_words == 120
    assert cfg.ingestion.embedding_parallelism == 3  # code default, not appsettings
    assert cfg.chat_quality.enable_recall_only_fallback_on_provider_failure is False
    assert cfg.chat_quality.minimum_strong_citation_score == 0.25


def test_settings_file_overrides_defaults(tmp_path):
    settings = tmp_path / "appsettings.json"
    settings.write_text(
        json.dumps(
            {
                "Ingestion": {"ChunkSizeWords": 50, "EmbeddingParallelism": 2},
                "ChatQuality": {"EnableRecallOnlyFallbackOnProviderFailure": True},
                "Embeddings": {"Provider": "Hash"},
            }
        )
    )
    cfg = load_config(settings_file=settings, env={})
    assert cfg.ingestion.chunk_size_words == 50
    assert cfg.ingestion.embedding_parallelism == 2
    assert cfg.chat_quality.enable_recall_only_fallback_on_provider_failure is True
    assert cfg.embeddings.provider == "Hash"


def test_env_overrides_settings_file(tmp_path):
    settings = tmp_path / "appsettings.json"
    settings.write_text(json.dumps({"Ingestion": {"ChunkSizeWords": 50}}))
    cfg = load_config(
        settings_file=settings,
        env={
            "OMNI__Ingestion__ChunkSizeWords": "77",
            "OMNI__Gemini__ApiKey": "k123",
            "OMNI__Health__ProbeExternalAi": "true",
        },
    )
    assert cfg.ingestion.chunk_size_words == 77
    assert cfg.gemini.api_key == "k123"
    assert cfg.health.probe_external_ai is True


def test_flat_overrides_like_reference_tests():
    cfg = load_config(
        settings_file=None,
        env={},
        overrides={"Ingestion:MaxUploadBytes": 1024, "Engine:Backend": "oracle"},
    )
    assert cfg.ingestion.max_upload_bytes == 1024
    assert cfg.engine.backend == "oracle"


def test_unknown_keys_ignored():
    cfg = load_config(settings_file=None, env={"OMNI__Nope__Key": "x"}, overrides={"Ingestion:Bogus": 1})
    assert cfg.ingestion.chunk_size_words == 120
