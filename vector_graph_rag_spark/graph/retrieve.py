"""Graph-RAG retrieval composite as a reusable library function.

The reference's ``VectorGraphRAG.retrieve`` dataflow (rag.py:587-647):
seed entities → subgraph expansion → relation→passage fan-out → rank →
final top-k.  The ranking here is the deterministic supporting-relation
count (the stand-in for the LLM rerank, reranker.py:95-296) so the whole
composite is one DataFrame DAG — ``entry()`` in ``__spark_entry__`` and
the ``/query`` API route both call this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_graph_rag_spark.functions.text import entity_id
from vector_graph_rag_spark.graph.builder import GraphTables
from vector_graph_rag_spark.graph.expand import expand_subgraph


def seed_frontier_from_names(spark, names: list[str]) -> DataFrame:
    """Entity-name strings → (entity_id) frontier via the deterministic
    normalized-name hash (the mock-NER path, extractor.py:324-375)."""
    from vector_graph_rag_spark.functions.literals import inline_rows

    return inline_rows(spark, [(s,) for s in names], "name string").select(
        entity_id("name").alias("entity_id")
    )


def retrieve_passages(
    graph: GraphTables,
    seed_entities: DataFrame,
    degree: int = 1,
    final_top_k: int = 3,
    expansion=None,
) -> DataFrame:
    """(passage_id, rank, n_supporting_relations, text) — top passages by
    how many expanded relations cite them, ties broken by passage_id.

    The final window is global but ranks only the expanded passage set,
    which eviction bounds at ``relation_number_threshold`` (config.py:
    100-103) — driver-safe at any corpus size.

    ``expansion``: pass a pre-computed ``ExpansionResult`` (e.g. one run
    with ``collect_history=True``) to rank against it instead of expanding
    again — the reference records history during the single expansion it
    retrieves with (knowledge_graph.py:292-346), and the ``/query`` route
    mirrors that by threading one expansion through both passages and
    history.
    """
    if expansion is None:
        expansion = expand_subgraph(graph, seed_entities, degree=degree)
    scored = (
        graph.relation_passage.join(expansion.relation_ids, "relation_id")
        .groupBy("passage_id")
        .agg(F.count(F.lit(1)).alias("n_supporting_relations"))
    )
    w = Window.orderBy(F.desc("n_supporting_relations"), F.asc("passage_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= final_top_k)
        .join(graph.passages.select(F.col("id").alias("passage_id"), "text"), "passage_id")
        .select("passage_id", "rank", "n_supporting_relations", "text")
        .orderBy("rank")
    )
