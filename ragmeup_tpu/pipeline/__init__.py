from ragmeup_tpu.pipeline.rag import RAGPipeline
from ragmeup_tpu.pipeline.llm_backends import (
    ChatBackend, LocalChatBackend, CloudChatBackend, StaticChatBackend,
)

__all__ = ["RAGPipeline", "ChatBackend", "LocalChatBackend",
           "CloudChatBackend", "StaticChatBackend"]
