from vector_graph_rag_spark.operators.topk import (
    cosine_topk,
    score_threshold_first_seen_dedup,
)
from vector_graph_rag_spark.operators.eviction import apply_eviction

__all__ = [
    "cosine_topk",
    "score_threshold_first_seen_dedup",
    "apply_eviction",
]
