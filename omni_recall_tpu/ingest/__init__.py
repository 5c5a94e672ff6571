from omni_recall_tpu.ingest.embedding import (  # noqa: F401
    EmbeddingResult,
    EmbeddingStatus,
    FakeEmbeddingClient,
    GeminiEmbeddingClient,
    HashEmbeddingClient,
    NoOpEmbeddingClient,
)
from omni_recall_tpu.ingest.service import DocumentIngestionService  # noqa: F401
