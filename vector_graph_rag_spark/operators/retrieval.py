"""Graph-RAG retrieval composites — the reference's orchestrated pipelines.

- `retrieve` = GraphRetriever.retrieve (retriever.py:287-365): mock-NER
  seeds → entity/relation seeding → degree-k expansion → eviction.
- `passages_from_relations` = rag.py:161-194 fan-out with first-seen
  order-preserving dedup.
- `retrieve_with_backfill` = rag.py:587-647: graph passages first; if fewer
  than top_k, append naive passages not already present (ordered
  union-dedup, rag.py:629-638).

Everything is one DataFrame DAG per query batch; the only driver-side
control flow is the fixed expansion-degree loop and the eviction count
branch (both bounded, data-independent in shape).  Scale: seeds/frontier
broadcast; edge tables partitioned by id; see graph/expand.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_graph_rag_spark.config import DEFAULT_CONFIG, EngineConfig
from vector_graph_rag_spark.graph.builder import GraphTables
from vector_graph_rag_spark.graph.expand import expand_subgraph
from vector_graph_rag_spark.operators.eviction import apply_eviction


def passages_from_relations(
    graph: GraphTables, ordered_relations: DataFrame
) -> DataFrame:
    """ordered_relations(relation_id, sel_order) → (passage_id,
    first_from_order) with first-seen dedup preserving relation order
    (rag.py:161-194)."""
    fan = graph.relation_passage.join(ordered_relations, "relation_id")
    w = Window.partitionBy("passage_id").orderBy("sel_order", "relation_id")
    return (
        fan.withColumn("__seen", F.row_number().over(w))
        .filter(F.col("__seen") == 1)
        .select("passage_id", F.col("sel_order").alias("first_from_order"))
    )


def retrieve(
    graph: GraphTables,
    seed_entities: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    query_vec: list[float] | None = None,
) -> DataFrame:
    """Seeds → expansion → eviction → ordered candidate relations
    (relation_id, sel_order).  The no-eviction branch orders by id
    lexicographically (retriever.py:263-265); the eviction branch orders by
    similarity (retriever.py:267-285)."""
    exp = expand_subgraph(graph, seed_entities, degree=cfg.expansion_degree)
    kept, _stats = apply_eviction(
        exp.relation_ids.select("relation_id"),
        graph.relations,
        query_vec=query_vec or [],
        threshold=cfg.relation_number_threshold,
    )
    return kept.select("relation_id", F.col("evict_order").alias("sel_order"))


def retrieve_with_backfill(
    graph: GraphTables,
    seed_entities: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    top_k: int | None = None,
    num_select: int | None = None,
) -> DataFrame:
    """Full retrieve + mock-rerank head-limit + fan-out + naive backfill
    (rag.py:587-647) → (passage_id, final_rank, src) with src ∈
    {graph, naive}.

    The naive backfill stand-in ranks passages by id (deterministic; the
    reference uses vector top-k there — swap in cosine_topk when real
    embeddings are attached).
    """
    top_k = top_k or cfg.final_top_k
    num_select = num_select or cfg.rerank_num_select

    candidates = retrieve(graph, seed_entities, cfg)
    # Mock rerank = first num_select in eviction order (rag.py:513-515).
    selected = candidates.filter(F.col("sel_order") <= num_select)
    graph_passages = passages_from_relations(graph, selected).select(
        "passage_id",
        F.col("first_from_order").alias("prio"),
        F.lit(0).alias("src_rank"),
        F.lit("graph").alias("src"),
    )
    # Naive backfill can contribute at most top_k rows, and only passages the
    # graph side did NOT hit — so anti-join first, then TakeOrderedAndProject
    # the ≤ top_k survivors.  (The old shape ranked the ENTIRE passage corpus
    # with an unpartitioned window just to throw almost all of it away; the
    # anti-join also preserves output: collided naive rows were dropped by
    # the first-seen dedup anyway, and relative naive order is id-asc either
    # way.)
    naive_pool = (
        graph.passages.select(F.col("id").alias("passage_id"))
        .join(graph_passages.select("passage_id"), "passage_id", "left_anti")
        .orderBy(F.asc("passage_id"))
        .limit(top_k)
    )
    w_naive = Window.orderBy(F.asc("passage_id"))
    naive = (
        naive_pool.withColumn("prio", F.row_number().over(w_naive))
        .withColumn("src_rank", F.lit(1))
        .withColumn("src", F.lit("naive"))
    )
    # Ordered union-dedup: graph hits first, then unseen naive hits
    # (rag.py:629-638).
    unioned = graph_passages.unionByName(naive)
    w_dedup = Window.partitionBy("passage_id").orderBy("src_rank", "prio")
    w_final = Window.orderBy("src_rank", "prio", "passage_id")
    return (
        unioned.withColumn("__seen", F.row_number().over(w_dedup))
        .filter(F.col("__seen") == 1)
        .withColumn("final_rank", F.row_number().over(w_final))
        .filter(F.col("final_rank") <= top_k)
        .select("passage_id", "final_rank", "src")
    )
