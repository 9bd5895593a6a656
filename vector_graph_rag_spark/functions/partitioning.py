"""Under-parallel scan guard (guide §2/§6).

A small corpus arriving as ONE parquet file scans as one task, so every
row-local map pass riding that scan — tokenize, shingle md5, minhash,
feature hashing, mock embeddings — serializes on a single core until the
first shuffle.  The conditional relayout below is the idiom three r15-r17
sites already use (`pq.write_ivfpq_index`, `vector_index.append_to_index`,
`term_index.append_term_batch`, measured 6x on the 10x smoke): repartition
ONLY when the scan is under-parallel, so a multi-file corpus — every real
deployment, and the 10x/100x smokes — skips the exchange entirely and the
guard is a no-op at scale.

Apply ONLY to scan-rooted frames (reads, or narrow projections/filters of
reads): ``df.rdd`` on a frame with a shuffle in its lineage would execute
the shuffle stages under AQE at call time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallel_scan(df: DataFrame) -> DataFrame:
    """Conditionally repartition an under-parallel scan-rooted frame to
    ``defaultParallelism`` so downstream row-local map work spreads over
    the cluster instead of the scan's file-split count."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, par // 2):
        return df.repartition(par)
    return df
