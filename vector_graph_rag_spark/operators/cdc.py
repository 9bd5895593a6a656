"""Snapshot diff (CDC) — what changed between two corpus versions.

An incremental training-data pipeline re-crawls and needs the delta, not
the corpus: which documents appeared, disappeared, or changed content.
Everything downstream (re-embedding, incremental dedup via
``dedup_incremental``, graph upserts via ``graph/crud.py``, index refresh
via ``streaming/index.py``) consumes exactly this delta.

One full-outer join on the key, comparing a content hash:

    added    — key only in the new snapshot
    removed  — key only in the old snapshot
    changed  — key in both, content hash differs

Unchanged rows are dropped (the whole point: the delta is small).
At 100 TB both sides shuffle once on the key — or zero times if the
snapshots are written bucketed by the key, the stated cluster layout
(SCALE.md §Known local-mode deviations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    content: Column | str = "text",
) -> DataFrame:
    """Returns (key, change, old_hash, new_hash) with change ∈
    {'added', 'removed', 'changed'}; unchanged keys are omitted.

    Presence is tracked with explicit per-side flags, not hash nullability:
    ``md5(NULL content)`` is NULL, so a key present on both sides with NULL
    text on one would otherwise be misread as added/removed, and a
    NULL-vs-NULL pair silently dropped.  With flags, NULL content compares
    null-safely — NULL vs NULL is unchanged, NULL vs text is changed.
    """
    c = F.col(content) if isinstance(content, str) else content
    o = old.select(
        F.col(key).alias(key),
        F.lit(True).alias("in_old"),
        F.md5(c).alias("old_hash"),
    )
    n = new.select(
        F.col(key).alias(key),
        F.lit(True).alias("in_new"),
        F.md5(c).alias("new_hash"),
    )
    joined = o.join(n, key, "full_outer")
    change = (
        F.when(F.col("in_old").isNull(), F.lit("added"))
        .when(F.col("in_new").isNull(), F.lit("removed"))
        .when(~F.col("old_hash").eqNullSafe(F.col("new_hash")), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(key, "change", "old_hash", "new_hash")
    )
