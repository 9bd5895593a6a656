from vector_graph_rag_spark.llm.runner import (
    ModelRunner,
    MockModelRunner,
    llm_map_operator,
)
from vector_graph_rag_spark.llm.rerank import parse_rerank_response, mock_rerank
from vector_graph_rag_spark.llm import prompts

__all__ = [
    "ModelRunner",
    "MockModelRunner",
    "llm_map_operator",
    "parse_rerank_response",
    "mock_rerank",
    "prompts",
]
