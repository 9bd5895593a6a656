"""Conditional eviction of expanded relations.

Reference _apply_eviction (retriever.py:232-285): if the expanded relation
set has ≤ `relation_number_threshold` (default 1000) members, keep ALL of
them sorted lexicographically by id (HippoRAG parity, retriever.py:263-265);
otherwise run a *filtered* vector search — top-`threshold` by similarity to
the query embedding *within* the candidate id-set (retriever.py:267-285).

The branch condition is data-dependent, so this operator takes one count()
action.  At scale that's a cheap aggregate; the expensive branch (scoring)
only touches the candidate set (semi-join), never the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_graph_rag_spark.functions.vector import cosine


def apply_eviction(
    candidate_relations: DataFrame,
    relations: DataFrame,
    query_vec: list[float],
    threshold: int = 1000,
    id_col: str = "relation_id",
    vec_col: str = "embedding",
    score_decimals: int | None = 6,
) -> tuple[DataFrame, dict]:
    """candidate_relations(relation_id) → (kept DF with eviction ordering, stats).

    Kept DF columns: relation_id, evict_order (1-based), score (null in the
    no-eviction branch, matching the reference which returns no scores there).

    The candidate set is eagerly localCheckpointed before the branch count:
    candidates typically arrive as the full expansion DAG, and without
    materialization the count action would execute that DAG once and the
    downstream retrieval action would execute it AGAIN (measured ~1.5s of
    the backfill composite's 4.1s at sf0.1).  The set is frontier-sized —
    bounded by the eviction threshold's input, never corpus-sized.
    """
    # lazy (r17): the branch count below materializes it — same lineage
    # cut and single execution of the expansion DAG, one fewer job
    candidate_relations = candidate_relations.localCheckpoint(eager=False)
    n = candidate_relations.count()
    if n <= threshold:
        # No eviction: all candidates, sorted lexicographically by id
        # (retriever.py:263-265).
        w = Window.orderBy(F.asc(id_col))
        kept = (
            candidate_relations.select(id_col)
            .withColumn("evict_order", F.row_number().over(w))
            .withColumn("score", F.lit(None).cast("double"))
        )
        return kept, {"applied": False, "before": n, "after": n}

    # Eviction: top-`threshold` by cosine to the query within the candidate
    # set (semi-join first so scoring never touches non-candidates).
    #
    # This branch fires exactly when the candidate set is LARGE (> threshold),
    # so the top-k must not be a global window sort: `orderBy().limit()`
    # compiles to TakeOrderedAndProject — per-partition local top-N plus a
    # tiny driver-side merge — and only the ≤ threshold survivors see the
    # (cheap, single-partition) ranking window.
    cand_ids = candidate_relations.select(F.col(id_col).alias("id"))
    cand = relations.join(F.broadcast(cand_ids), "id", "left_semi")
    score = cosine(F.col(vec_col), F.lit(query_vec).cast("array<double>"))
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    survivors = (
        cand.withColumn("score", score)
        .select("id", "score")
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(threshold)
    )
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    kept = (
        survivors.withColumn("evict_order", F.row_number().over(w))
        .select(F.col("id").alias(id_col), "evict_order", "score")
    )
    return kept, {"applied": True, "before": n, "after": threshold}
