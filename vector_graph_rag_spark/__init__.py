"""vector_graph_rag_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of zilliztech/vector-graph-rag.

The reference system (studied read-only at /root/reference) is a Graph-RAG
engine that stores a tripartite knowledge graph (entities / relations /
passages) in three Milvus vector collections and composes ~30 Python dataflow
operators over them (see SURVEY.md §2).  This package re-expresses every one
of those operators — plus the large-scale LLM-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal columns) — as idiomatic
Spark DataFrame / SQL pipelines designed for 100 TB batch scale:

- declarative plans (Catalyst does pushdown / pruning / join selection),
- deterministic sha2-derived ids (reference uses UUID4: builder.py:20-22),
- vector search as broadcast-join + window top-k or LSH (no ANN service),
- iterative k-hop expansion as checkpointed DataFrame joins,
- all LLM / embedding stages behind a pluggable, mockable, cache-fronted
  model runner (Arrow-batched `mapInPandas`).
"""

from vector_graph_rag_spark.config import EngineConfig
from vector_graph_rag_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]
__version__ = "0.4.0"
