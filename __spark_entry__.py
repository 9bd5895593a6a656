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


# The driver oracle-checks only the alphabetically-first 50 keys of
# ``queries()``.  With 91 declared queries, a plain sort left 41 of them
# (including the reference's core traversal ``subgraph_expand_d1/d2``,
# ``naive_rag_topk``, ``recall_at_k`` and every ``stream_*``) without a driver
# CORRECTNESS row in rounds 1-3.  Per round-3 verdict item 1, the driver-facing
# registry re-keys exactly those queries with an ``a_`` sort prefix so they land
# inside the 50-query window this round; the queries displaced by the rotation
# all carry green rows in CORRECTNESS_r03.json, so the union of rounds covers
# every declared query.  Internal names (registry, tests, bench) are unchanged;
# only the exported key carries the prefix.  See COVERAGE.md §"driver window".
_WINDOW_PRIORITY = frozenset(
    {
        "minhash_lsh_pairs",
        "minhash_lsh_pairs_capped",
        "minhash_signatures",
        "mock_embed_documents",
        "multimodal_binary_profile",
        "multimodal_decode_features",
        "naive_rag_topk",
        "nation_balance_full_outer",
        "nation_setops",
        "neardup_clusters",
        "ner_cache_lookup",
        "ngram_jaccard_pairs",
        "orders_by_month",
        "orders_grouping_sets",
        "orders_moving_avg",
        "passage_fanout_dedup",
        "pricing_summary",
        "quality_score",
        "quantized_cosine_topk",
        "recall_at_k",
        "rerank_line_repair",
        "returnflag_pivot",
        "salted_token_counts",
        "sessionize_events",
        "shipping_priority",
        "simhash_signatures",
        "similarity_threshold_filter",
        "stratified_sample_per_source",
        "stream_dedup_users",
        "stream_interval_join_15m",
        "stream_session_window_30m",
        "stream_sliding_15m",
        "stream_tumbling_30m",
        "subgraph_expand_d1",
        "subgraph_expand_d2",
        "subgraph_expand_passages",
        "tfdf_top_terms",
        "token_profile",
        "topk_orders_per_customer",
        "train_test_split_hash",
        "winnow_fingerprints",
        # new this round — never driver-checked, so window them immediately
        "entity_ppr_seeds_k8",
        "dedup_incremental",
        "corpus_curation_funnel",
    }
)


def _driver_key(name: str) -> str:
    return f"a_{name}" if name in _WINDOW_PRIORITY else name


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from vector_graph_rag_spark.queries import load_all

    items = {_driver_key(name): q.fn for name, q in load_all().items()}
    return dict(sorted(items.items()))


def oracle_sql() -> dict[str, str]:
    from vector_graph_rag_spark.queries import load_all

    items = {
        _driver_key(name): q.oracle
        for name, q in load_all().items()
        if q.oracle is not None
    }
    return dict(sorted(items.items()))
