from omni_recall_tpu.parallel.mesh import shards_mesh  # noqa: F401
from omni_recall_tpu.parallel.sharded import ShardedScorer  # noqa: F401
