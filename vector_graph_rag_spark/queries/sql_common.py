"""Shared DuckDB-SQL text fragments for the oracle side of declared queries.

These fragments replicate — in portable SQL — exactly the semantics of the
Spark implementations (functions/text.py, graph/builder.py).  The pairs are
kept adjacent in the query modules so drift is visible in review.
"""

from __future__ import annotations

from vector_graph_rag_spark.functions.hashing import (
    MERSENNE_P,
    hash60_sql,
    seeded_hash60_sql,
)

__all__ = [
    "MERSENNE_P",
    "hash60_sql",
    "seeded_hash60_sql",
    "norm_sql",
    "TRIPS_CTE",
    "dec",
]


def norm_sql(expr: str) -> str:
    """DuckDB text for functions.text.normalize_phrase (extractor.py:17-28)."""
    return f"trim(regexp_replace(lower({expr}), '[^A-Za-z0-9 ]', ' ', 'g'))"


def dec(expr: str, scale: int = 4) -> str:
    """Cast to exact decimal so SUMs are order-independent (see queries/relational.py)."""
    return f"CAST({expr} AS DECIMAL(18,{scale}))"


# Mock-OpenIE triplet derivation over the synthetic `documents` table —
# byte-for-byte the SQL twin of graph.builder.synthetic_triplet_docs +
# explode_triplets.  `trips` columns: passage_id, tidx, subject, predicate,
# object, subject_norm, object_norm, rel_text, rel_norm, rel_id,
# subj_entity_id, obj_entity_id.
TRIPS_CTE = f"""
docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, source FROM documents
),
trip_raw AS (
      SELECT doc_id, 0 AS tidx, split_part(text,' ',1) AS subject,
             split_part(text,' ',2) AS predicate, split_part(text,' ',3) AS object FROM docs
  UNION ALL
      SELECT doc_id, 1, split_part(text,' ',4), split_part(text,' ',5), split_part(text,' ',6) FROM docs
  UNION ALL
      SELECT doc_id, 2, split_part(text,' ',7), split_part(text,' ',8), split_part(text,' ',9) FROM docs
  UNION ALL
      SELECT doc_id, 3, source, 'publishes', split_part(text,' ',1) FROM docs
),
trips AS (
  SELECT doc_id AS passage_id, tidx, subject, predicate, object,
         {norm_sql('subject')} AS subject_norm,
         {norm_sql('object')} AS object_norm,
         concat_ws(' ', subject, predicate, object) AS rel_text,
         {norm_sql("concat_ws(' ', subject, predicate, object)")} AS rel_norm,
         sha256('relation:' || {norm_sql("concat_ws(' ', subject, predicate, object)")}) AS rel_id,
         sha256('entity:' || {norm_sql('subject')}) AS subj_entity_id,
         sha256('entity:' || {norm_sql('object')}) AS obj_entity_id
  FROM trip_raw
),
entity_relation AS (
  SELECT DISTINCT entity_id, relation_id FROM (
        SELECT subj_entity_id AS entity_id, rel_id AS relation_id FROM trips
    UNION ALL
        SELECT obj_entity_id, rel_id FROM trips
  )
),
relation_passage AS (
  SELECT DISTINCT rel_id AS relation_id, passage_id FROM trips
)
"""
