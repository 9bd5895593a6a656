from vector_graph_rag_spark.functions.text import (
    normalize_phrase,
    entity_id,
    relation_id,
    passage_id,
    relation_text,
    tokens,
)
from vector_graph_rag_spark.functions.hashing import hash60, seeded_hash60
from vector_graph_rag_spark.functions.vector import (
    dot,
    l2_norm,
    l2_normalize,
    cosine,
)

__all__ = [
    "normalize_phrase",
    "entity_id",
    "relation_id",
    "passage_id",
    "relation_text",
    "tokens",
    "hash60",
    "seeded_hash60",
    "dot",
    "l2_norm",
    "l2_normalize",
    "cosine",
]
