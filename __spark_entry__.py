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
    """Flagship: graph-RAG retrieve (build → expand → fan-out → top-3)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vector_graph_rag_spark.graph.builder import build_graph, synthetic_triplet_docs
    from vector_graph_rag_spark.graph.expand import expand_subgraph
    from vector_graph_rag_spark.queries.graphrag import _seed_entities
    from vector_graph_rag_spark.sources.tables import load_table

    docs = synthetic_triplet_docs(load_table(spark, SF0001, "documents"))
    graph = build_graph(docs)
    expansion = expand_subgraph(graph, _seed_entities(spark), degree=1)
    # Rank reachable passages by how many expanded relations cite them
    # (deterministic stand-in for the LLM rerank, reranker.py:95-296), then
    # final_top_k=3 (config.py:104-106).
    scored = (
        graph.relation_passage.join(expansion.relation_ids, "relation_id")
        .groupBy("passage_id")
        .agg(F.count(F.lit(1)).alias("n_supporting_relations"))
    )
    w = Window.orderBy(F.desc("n_supporting_relations"), F.asc("passage_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .join(graph.passages.select(F.col("id").alias("passage_id"), "text"), "passage_id")
        .select("passage_id", "rank", "n_supporting_relations", "text")
        .orderBy("rank")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from vector_graph_rag_spark.queries import load_all

    return {name: q.fn for name, q in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    from vector_graph_rag_spark.queries import load_all

    return {
        name: q.oracle for name, q in sorted(load_all().items()) if q.oracle is not None
    }
