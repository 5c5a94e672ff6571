from omni_recall_tpu.index.records import ChunkRecord, DocumentRecord  # noqa: F401
from omni_recall_tpu.index.store import (  # noqa: F401
    InMemoryIngestionStore,
    InMemoryRawDocumentStore,
    LocalFileRawDocumentStore,
)
