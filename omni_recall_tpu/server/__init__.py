from omni_recall_tpu.server.app import OmniRecallApp, build_app  # noqa: F401
from omni_recall_tpu.server.testing import TestClient  # noqa: F401
