from omni_recall_tpu.chat.router import (  # noqa: F401
    AiChatRouter,
    AiProviderUnavailableError,
    AiRateLimitError,
    HttpRequestError,
)
from omni_recall_tpu.chat.orchestration import ChatOrchestrationService  # noqa: F401
