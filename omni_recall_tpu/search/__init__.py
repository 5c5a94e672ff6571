from omni_recall_tpu.search.engine import RecallEngine, SearchHit  # noqa: F401
from omni_recall_tpu.search.service import RecallSearchService  # noqa: F401
