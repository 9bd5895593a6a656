"""Graph construction: documents + triplets → five graph tables.

Re-expresses the reference's in-memory GraphBuilder
(/root/reference/src/vector_graph_rag/graph/builder.py:49-197) as pure
relational algebra:

- entity dedup on normalized lowercase name (builder.py:62,76-85) — the
  *stored* name is the FIRST-SEEN raw form; we replicate "first seen" with an
  explicit arrival order (doc order, triplet index, subject-before-object)
  so the result is deterministic and oracle-checkable (SURVEY §7 risk list).
- relation dedup on normalized "s p o" text (builder.py:63,97-109).
- six adjacency relationships (builder.py:69-74) materialized BOTH ways:
  * normalized edge tables `entity_relation`, `entity_passage`,
    `relation_passage` — the scale path: joins on co-partitionable keys,
    deletes are row deletes, no unbounded arrays;
  * sorted array columns on the node tables — parity with the reference's
    Milvus dynamic fields (rag.py:320-352).

Scale design (100 TB): every groupBy shuffles on the dedup key, which is
exactly the partitioning later joins want; the window that picks the
first-seen form partitions by the same key, so Catalyst reuses one shuffle
for dedup + representative-selection + adjacency aggregation.  No driver
loops, no collects.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_graph_rag_spark.functions.text import (
    entity_id,
    normalize_phrase,
    relation_id,
    relation_text,
)


@dataclass
class GraphTables:
    """The five tables of one graph (SURVEY §1.4)."""

    entities: DataFrame        # id, name, passage_ids, relation_ids
    relations: DataFrame       # id, text, subject, predicate, object,
                               # src_entity_id, dst_entity_id, passage_ids
    passages: DataFrame        # id, text, entity_ids, relation_ids
    entity_relation: DataFrame  # entity_id, relation_id
    relation_passage: DataFrame  # relation_id, passage_id

    def entity_passage(self) -> DataFrame:
        """entity_id → passage_id edge table (derived)."""
        return (
            self.entity_relation.join(self.relation_passage, "relation_id")
            .select("entity_id", "passage_id")
            .distinct()
        )


def synthetic_triplet_docs(documents: DataFrame) -> DataFrame:
    """Deterministic mock OpenIE over the driver's synthetic `documents`
    table — stands in for the reference's LLM triplet extractor
    (llm/extractor.py:83-233) in all correctness runs (FIXTURES.md §3).

    Rule (SQL-expressible, replicated verbatim in the DuckDB oracle):
    tokens = split(text, ' '); triplets =
      (tok1, tok2, tok3), (tok4, tok5, tok6), (tok7, tok8, tok9),
      (source, 'publishes', tok1).
    Output: doc_id(string), text, triplets array<struct<subject,predicate,object>>.
    """
    tok = lambda n: F.element_at(F.split(F.col("text"), " "), n)  # noqa: E731
    trip = lambda s, p, o: F.struct(  # noqa: E731
        s.alias("subject"), p.alias("predicate"), o.alias("object")
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "text",
        F.array(
            trip(tok(1), tok(2), tok(3)),
            trip(tok(4), tok(5), tok(6)),
            trip(tok(7), tok(8), tok(9)),
            trip(F.col("source"), F.lit("publishes"), tok(1)),
        ).alias("triplets"),
    )


def explode_triplets(docs: DataFrame) -> DataFrame:
    """docs(doc_id, text, triplets) → one row per triplet with arrival order
    and normalized keys/ids.

    Columns: passage_id, tidx, subject, predicate, object, subject_norm,
    object_norm, rel_text, rel_norm, rel_id, subj_entity_id, obj_entity_id.
    """
    t = docs.select(
        F.col("doc_id").alias("passage_id"),
        F.posexplode("triplets").alias("tidx", "trip"),
    ).select(
        "passage_id",
        "tidx",
        F.col("trip.subject").alias("subject"),
        F.col("trip.predicate").alias("predicate"),
        F.col("trip.object").alias("object"),
    )
    return (
        t.withColumn("subject_norm", normalize_phrase("subject"))
        .withColumn("object_norm", normalize_phrase("object"))
        .withColumn("rel_text", relation_text("subject", "predicate", "object"))
        .withColumn("rel_norm", normalize_phrase(relation_text("subject", "predicate", "object")))
        .withColumn("rel_id", relation_id(relation_text("subject", "predicate", "object")))
        .withColumn("subj_entity_id", entity_id("subject"))
        .withColumn("obj_entity_id", entity_id("object"))
    )


def build_graph(docs: DataFrame) -> GraphTables:
    """documents+triplets → GraphTables (reference builder.py:159-197)."""
    trips = explode_triplets(docs)

    # ---- entities: mentions from subject (part=0) and object (part=1) slots.
    mentions = trips.select(
        F.col("subj_entity_id").alias("id"),
        F.col("subject").alias("name"),
        F.col("subject_norm").alias("norm"),
        "passage_id",
        "tidx",
        F.lit(0).alias("part"),
    ).unionByName(
        trips.select(
            F.col("obj_entity_id").alias("id"),
            F.col("object").alias("name"),
            F.col("object_norm").alias("norm"),
            "passage_id",
            "tidx",
            F.lit(1).alias("part"),
        )
    )
    # first-seen raw name per normalized key (builder.py:76-85): arrival
    # order = (passage_id, tidx, subject-before-object).
    w_first = Window.partitionBy("id").orderBy("passage_id", "tidx", "part")
    entity_names = (
        mentions.withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .select("id", "name")
    )
    entity_passage = mentions.select("id", "passage_id").distinct().withColumnRenamed("id", "entity_id")

    # ---- relations: dedup on normalized "s p o"; first-seen raw S/P/O.
    w_rel = Window.partitionBy("rel_id").orderBy("passage_id", "tidx")
    relations_core = (
        trips.withColumn("rn", F.row_number().over(w_rel))
        .filter(F.col("rn") == 1)
        .select(
            F.col("rel_id").alias("id"),
            F.col("rel_text").alias("text"),
            "subject",
            "predicate",
            "object",
            F.col("subj_entity_id").alias("src_entity_id"),
            F.col("obj_entity_id").alias("dst_entity_id"),
        )
    )
    relation_passage = (
        trips.select(F.col("rel_id").alias("relation_id"), "passage_id").distinct()
    )
    # entity→relation adjacency covers BOTH endpoints (builder.py:110-121).
    entity_relation = (
        trips.select(F.col("subj_entity_id").alias("entity_id"), F.col("rel_id").alias("relation_id"))
        .unionByName(
            trips.select(F.col("obj_entity_id").alias("entity_id"), F.col("rel_id").alias("relation_id"))
        )
        .distinct()
    )

    # ---- array-column parity views (sorted for determinism).
    entities = (
        entity_names.join(
            entity_passage.groupBy("entity_id").agg(
                F.sort_array(F.collect_set("passage_id")).alias("passage_ids")
            ),
            entity_names.id == F.col("entity_id"),
            "left",
        )
        .drop("entity_id")
        .join(
            entity_relation.groupBy("entity_id").agg(
                F.sort_array(F.collect_set("relation_id")).alias("relation_ids")
            ),
            entity_names.id == F.col("entity_id"),
            "left",
        )
        .drop("entity_id")
        .select("id", "name", "passage_ids", "relation_ids")
    )
    relations = relations_core.join(
        relation_passage.groupBy("relation_id").agg(
            F.sort_array(F.collect_set("passage_id")).alias("passage_ids")
        ),
        relations_core.id == F.col("relation_id"),
        "left",
    ).drop("relation_id")

    passages = (
        docs.select(F.col("doc_id").alias("id"), "text")
        .join(
            trips.groupBy("passage_id").agg(
                F.sort_array(F.collect_set("rel_id")).alias("relation_ids")
            ),
            F.col("id") == F.col("passage_id"),
            "left",
        )
        .drop("passage_id")
        .join(
            mentions.groupBy("passage_id").agg(
                F.sort_array(F.collect_set("id")).alias("entity_ids")
            ),
            F.col("id") == F.col("passage_id"),
            "left",
        )
        .drop("passage_id")
        # Triplet-less passages (empty/short text) keep EMPTY adjacency
        # arrays, not NULLs — the reference always stores lists
        # (rag.py:347-352).
        .select(
            "id",
            "text",
            F.coalesce("entity_ids", F.array().cast("array<string>")).alias("entity_ids"),
            F.coalesce("relation_ids", F.array().cast("array<string>")).alias("relation_ids"),
        )
    )

    return GraphTables(
        entities=entities,
        relations=relations,
        passages=passages,
        entity_relation=entity_relation,
        relation_passage=relation_passage,
    )
