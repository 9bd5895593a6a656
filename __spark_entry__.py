"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship Graph-RAG retrieval pipeline at sf0.001 —
  mock-NER seeds → knowledge-graph build → degree-1 subgraph expansion →
  relation→passage fan-out → final top-k passages (the reference's
  `VectorGraphRAG.retrieve` dataflow, rag.py:587-647, re-expressed as one
  DataFrame DAG).
- ``queries()``: every declared operator from SURVEY.md §2 + north-star
  extensions (registry: vector_graph_rag_spark/queries/).
- ``oracle_sql()``: the DuckDB twin for each query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: graph-RAG retrieve (build → expand → fan-out → top-3).

    Ranking is the deterministic supporting-relation count (stand-in for
    the LLM rerank, reranker.py:95-296); final_top_k=3 (config.py:104-106).
    """
    from vector_graph_rag_spark.graph.builder import build_graph, synthetic_triplet_docs
    from vector_graph_rag_spark.graph.retrieve import retrieve_passages
    from vector_graph_rag_spark.queries.graphrag import _seed_entities
    from vector_graph_rag_spark.sources.tables import load_table

    docs = synthetic_triplet_docs(load_table(spark, SF0001, "documents"))
    graph = build_graph(docs)
    return retrieve_passages(graph, _seed_entities(spark), degree=1, final_top_k=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from vector_graph_rag_spark.queries import load_all

    return {name: q.fn for name, q in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    from vector_graph_rag_spark.queries import load_all

    return {
        name: q.oracle for name, q in sorted(load_all().items()) if q.oracle is not None
    }
