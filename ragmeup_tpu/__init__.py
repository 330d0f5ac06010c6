"""ragmeup_tpu — a TPU-native retrieval-augmented-generation framework.

A ground-up rebuild of the capabilities of AI-Commandos/RAGMeUp designed for
TPU hardware: the corpus lives HBM-resident and is queried with JAX/Pallas
kernels (tiled matmul + fused top-k for dense retrieval, CSR postings scoring
for BM25, batched cross-encoder forwards for reranking), scaling over an ICI
mesh via ``jax.sharding`` with a single allgather merge on the query path.

Where the reference (see SURVEY.md) orchestrates external engines — Milvus /
pgvector for ANN, ParadeDB's Tantivy BM25, torch+CUDA for model forwards —
this framework *is* the engine.
"""

__version__ = "0.1.0"

from ragmeup_tpu.config import RagConfig, load_config

__all__ = ["RagConfig", "load_config", "__version__"]
