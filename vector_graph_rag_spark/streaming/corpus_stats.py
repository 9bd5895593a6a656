"""Incremental corpus statistics from mergeable HLL register shards.

A 100 TB pipeline reports per-shard and whole-corpus cardinalities
constantly — distinct documents, sources, vocabulary, dedup keys — and
re-scanning the corpus per dashboard refresh is exactly the cost this
engine exists to avoid.  HyperLogLog registers are MERGEABLE: union is a
bucket-wise ``max``, which is associative and commutative, so the merged
estimate is IDENTICAL no matter how the corpus was sharded or replayed.

This is a from-scratch HLL (Flajolet et al. 2007) as pure DataFrame ops,
NOT Spark's DataSketches binding: the built-in ``hll_union_agg`` runs a
HIP-based estimator whose result depends on the order sketches are
absorbed (measured ±0.5% across shardings of the same corpus) — fine for
dashboards, wrong for incremental state whose invariant is "merged shard
state == one pass".  Here the sketch IS its register table:

- hash: the md5-derived 60-bit ``hash60`` (cross-engine portable, same
  family as minhash/Bloom); top ``p=12`` bits -> bucket, the remaining 48
  bits -> rho (leading-zero count + 1, via exact integer bit-length —
  no float log2 anywhere).
- shard state: one ``(col, bucket, rho)`` row per occupied bucket
  (≤ 4096 rows per tracked column) under
  ``state_dir/batch=<batch_id>``, ``mode=overwrite`` — a REPLAYED batch
  id overwrites its own shard, so delivery is idempotent under the
  stream's checkpoint (same contract as ``streaming/lm_counts``).
- merge: ``groupBy(col, bucket).max(rho)`` then the standard corrected
  estimate (linear counting below 2.5m with empty buckets) — a
  shard-count-sized aggregation; the corpus is never re-read.

Standard error ~1.04/sqrt(4096) ≈ 1.6%.  Additive counters (rows, bytes)
ride the same shards exactly.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_graph_rag_spark.functions.hashing import hash60

_P = 12
_M = 1 << _P  # 4096 buckets
_RHO_BITS = 48  # 60-bit hash minus the bucket bits
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)


def _registers(df: DataFrame, col: str) -> DataFrame:
    """(bucket, rho) register maxima of one column — the HLL sketch as a
    DataFrame.  rho = leading zeros of the 48 low hash bits + 1, computed
    with exact integer bit-length (``conv`` to base 2), never float log."""
    h = hash60(F.col(col).cast("string"))
    rem = F.pmod(h, F.lit(1 << _RHO_BITS))
    rho = F.when(rem == 0, F.lit(_RHO_BITS + 1)).otherwise(
        F.lit(_RHO_BITS + 1) - F.length(F.conv(rem, 10, 2))
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            F.shiftright(h, 60 - _P).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def _batch_stats(batch_df: DataFrame, cols: list[str]) -> DataFrame:
    """Register rows + additive counters for one micro-batch: one row per
    (col, bucket), plus a bucket=-1 counter row carrying (n_rows, n_bytes)
    in place of a register."""
    parts = []
    for c in cols:
        s = F.col(c).cast("string")
        parts.append(
            _registers(batch_df, c).select(
                F.lit(c).alias("col"),
                F.col("bucket").cast("long").alias("bucket"),
                F.col("rho").cast("long").alias("rho"),
            )
        )
        parts.append(
            batch_df.agg(
                F.lit(c).alias("col"),
                F.lit(-1).cast("long").alias("bucket"),
                F.count(s).alias("n_rows"),
                # octet_length = UTF-8 BYTES (F.length counts characters
                # and undercounts multi-byte text up to 4x)
                F.coalesce(F.sum(F.octet_length(s)), F.lit(0)).alias("n_bytes"),
            ).select(
                "col",
                "bucket",
                F.lit(None).cast("long").alias("rho"),
                "n_rows",
                "n_bytes",
            )
        )
    out = None
    for p in parts:
        if "n_rows" not in p.columns:
            p = p.select(
                "col", "bucket", "rho",
                F.lit(None).cast("long").alias("n_rows"),
                F.lit(None).cast("long").alias("n_bytes"),
            )
        out = p if out is None else out.unionByName(p)
    return out


def write_batch_stats(
    batch_df: DataFrame, state_dir: str, batch_id: int, cols: list[str]
) -> None:
    """Sketch one micro-batch and overwrite its shard — idempotent per
    batch id (exposed for tests and backfills; the stream calls this)."""
    _batch_stats(batch_df, cols).write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch={batch_id}")
    )


def stream_corpus_stats(
    spark: SparkSession,
    docs_dir: str,
    state_dir: str,
    cols: list[str],
) -> int:
    """Stream parquet files into the register-shard tree; returns
    micro-batches processed.  Bounded drain (``availableNow``) for tests
    and backfills; a live pipeline adds a ``checkpointLocation`` so batch
    ids are stable across restarts and replays stay idempotent."""
    from vector_graph_rag_spark.streaming.ingest import file_stream

    n_batches = [0]

    def _write(batch_df, batch_id: int) -> None:
        write_batch_stats(batch_df, state_dir, batch_id, cols)
        n_batches[0] += 1

    q = (
        file_stream(spark, docs_dir)
        .writeStream.foreachBatch(_write)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()
    return n_batches[0]


def corpus_stats(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the shard tree into per-column corpus statistics:
    ``(col, distinct_est, n_rows, n_bytes, n_shards)``.

    Register merge is ``max`` per (col, bucket) — associative and
    commutative, so ``distinct_est`` is EXACTLY the same for any sharding
    or replay of the corpus (test-pinned).  Estimate = the standard
    corrected HLL: raw ``alpha * m^2 / sum(2^-rho)`` with empty buckets
    contributing 2^0, switched to linear counting ``m * ln(m / zeros)``
    below 2.5m when empty buckets remain."""
    shards = spark.read.parquet(state_dir)
    regs = (
        shards.filter(F.col("bucket") >= 0)
        .groupBy("col", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    est = regs.groupBy("col").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_present"),
        F.count("*").alias("occupied"),
    )
    zeros = F.lit(_M) - F.col("occupied")
    raw = F.lit(_ALPHA * _M * _M) / (F.col("s_present") + zeros)
    corrected = F.when(
        (raw <= 2.5 * _M) & (zeros > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / zeros),
    ).otherwise(raw)
    counters = (
        shards.filter(F.col("bucket") == -1)
        .groupBy("col")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_bytes").alias("n_bytes"),
            F.count("*").alias("n_shards"),
        )
    )
    return (
        counters.join(
            est.select("col", F.round(corrected).cast("long").alias("distinct_est")),
            "col",
            "left",
        )
        .select(
            "col",
            F.coalesce("distinct_est", F.lit(0)).alias("distinct_est"),
            "n_rows",
            "n_bytes",
            "n_shards",
        )
        .orderBy("col")
    )


def stats_drift(
    cur: DataFrame, prev: DataFrame, max_rel_change: float = 0.5
) -> DataFrame:
    """Per-column drift report between two :func:`corpus_stats` outputs —
    the monitoring check a nightly pipeline runs before promoting a new
    corpus version: a distinct-count or row-count swinging more than
    ``max_rel_change`` relative to the previous run usually means a
    broken upstream feed, not organic growth.

    Returns (col, metric, prev, cur, rel_change, ok) with one row per
    (column, metric) pair; a column missing on either side reports with
    NULLs and ok = false.  Both inputs are stats frames (one row per
    column), so this is driver-trivial arithmetic over tiny data.
    """
    metrics = ["distinct_est", "n_rows", "n_bytes"]
    stacked = None
    for m in metrics:
        c = cur.select("col", F.lit(m).alias("metric"), F.col(m).cast("double").alias("cur"))
        p = prev.select("col", F.lit(m).alias("metric"), F.col(m).cast("double").alias("prev"))
        j = p.join(c, ["col", "metric"], "full_outer")
        stacked = j if stacked is None else stacked.unionByName(j)
    rel = F.when(
        F.col("prev").isNull() | F.col("cur").isNull(), F.lit(None)
    ).otherwise(
        F.abs(F.col("cur") - F.col("prev")) / F.greatest(F.abs("prev"), F.lit(1.0))
    )
    return stacked.select(
        "col",
        "metric",
        "prev",
        "cur",
        rel.alias("rel_change"),
        F.coalesce(rel <= max_rel_change, F.lit(False)).alias("ok"),
    ).orderBy("col", "metric")


# --- Incremental quantile registers (HDR-style integer histogram) -----------
#
# Percentile tracking (P50/P99 document length, token count, byte size) is
# the other statistic a nightly pipeline reports per shard and per corpus.
# Exact percentiles need a global sort; sampled sketches (t-digest, KLL)
# have merge results that depend on compaction order.  This register table
# does neither: values are binned by PURE-INTEGER arithmetic — bucket id =
# bit_length(v) * 2^(SUBBITS+1) + (top SUBBITS+1 bits of v) — so bucket
# counts are plain additive counters: shard merge is a SUM, EXACTLY
# sharding- and replay-invariant (the same contract as the HLL registers
# above), and DuckDB reproduces the bucket table bit-for-bit
# (bit_length via length(to_base(v, 2)), the same primitive as rho).
# Quantile answers carry the bucket's value bounds: relative error
# <= 2^-SUBBITS (6.25% at 4) by construction, and values < 2^(SUBBITS+1)
# bin EXACTLY.  This is the HdrHistogram design (Gil Tene, public domain)
# reduced to its integer core.  <= 64 * 2^(SUBBITS+1) buckets per column,
# so the merged state is always driver-trivial.

_Q_SUBBITS = 4
_Q_SMALL_BITS = _Q_SUBBITS + 1
_Q_SMALL = 1 << _Q_SMALL_BITS  # values below this get exact buckets


def _qbuckets(df: DataFrame, col: str) -> DataFrame:
    """(qb, cnt) bucket counts of one non-negative numeric column.

    v <= 0 collapses into bucket 0 (a corpus length/size metric has no
    negative values; zeros are counted, not binned).  All-integer:
    e = bit_length(v), m = v >> max(e - 5, 0), qb = e * 32 + m."""
    d = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(col).cast("long").alias("v"))
        .select(
            "v",
            F.when(F.col("v") <= 0, F.lit(0))
            .otherwise(F.length(F.conv("v", 10, 2)))
            .alias("e"),
        )
    )
    m = F.when(F.col("v") <= 0, F.lit(0)).otherwise(
        F.expr(f"shiftright(v, greatest(e - {_Q_SMALL_BITS}, 0))")
    )
    return (
        d.select((F.col("e") * _Q_SMALL + m).cast("long").alias("qb"))
        .groupBy("qb")
        .agg(F.count("*").alias("cnt"))
    )


def qbucket_bounds(qb: int) -> tuple[int, int]:
    """[lo, hi] value range of a bucket id (driver-side decode)."""
    e, m = divmod(int(qb), _Q_SMALL)
    if e == 0:
        return (0, 0)  # v <= 0
    if e <= _Q_SMALL_BITS:
        return (m, m)  # exact region
    shift = e - _Q_SMALL_BITS
    return (m << shift, ((m + 1) << shift) - 1)


def write_batch_quantiles(
    batch_df: DataFrame, state_dir: str, batch_id: int, cols: list[str]
) -> None:
    """Bucket-count one micro-batch's numeric columns and overwrite its
    shard — idempotent per batch id (the corpus_stats shard contract)."""
    out = None
    for c in cols:
        p = _qbuckets(batch_df, c).select(
            F.lit(c).alias("col"), "qb", F.col("cnt").cast("long").alias("cnt")
        )
        out = p if out is None else out.unionByName(p)
    out.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch={batch_id}")
    )


def corpus_quantiles(
    spark: SparkSession, state_dir: str, qs: tuple = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Fold the quantile-shard tree into per-column percentile bounds:
    ``(col, q, lo, hi, n_rows)``.

    Merge = SUM of bucket counts per (col, qb) — additive, so the merged
    histogram is EXACTLY the single-pass histogram for any sharding or
    replay of the corpus.  The quantile walk runs driver-side over the
    bounded bucket table (<= 2048 rows per column); ``lo``/``hi`` bound
    the true q-quantile: the reported bucket provably contains the value
    of rank ceil(q * n) (nearest-rank definition), so hi/lo <= 1 +
    2^-SUBBITS."""
    merged = (
        spark.read.parquet(state_dir)
        .groupBy("col", "qb")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    by_col: dict[str, list] = {}
    for r in merged:
        by_col.setdefault(r["col"], []).append((int(r["qb"]), int(r["cnt"])))
    rows = []
    for c, buckets in sorted(by_col.items()):
        buckets.sort()
        n = sum(cnt for _, cnt in buckets)
        for q in qs:
            if n == 0:
                rows.append((c, float(q), None, None, 0))
                continue
            target = max(1, min(n, math.ceil(q * n)))  # nearest-rank
            seen = 0
            for qb, cnt in buckets:
                seen += cnt
                if seen >= target:
                    lo, hi = qbucket_bounds(qb)
                    rows.append((c, float(q), lo, hi, n))
                    break
    from vector_graph_rag_spark.functions.literals import inline_rows

    return inline_rows(
        spark, rows, "col string, q double, lo long, hi long, n_rows long"
    )


def quantile_drift(
    cur: DataFrame, prev: DataFrame, max_rel_change: float = 0.5
) -> DataFrame:
    """Drift report between two :func:`corpus_quantiles` outputs — the
    distribution-shape check additive totals can mask (half the documents
    truncated and half doubled keeps n_bytes flat but moves P50).

    Quantile answers are [lo, hi] brackets, so drift is bracket-aware:
    a (col, q) flags only when the brackets are DISJOINT by more than
    ``max_rel_change`` relative to the previous bracket (cur.lo >
    prev.hi * (1+t) or cur.hi < prev.lo / (1+t)) — overlap or sub-bound
    movement can never false-positive from binning alone.  A (col, q)
    missing on either side reports with NULLs and ok = false.
    """
    t = float(max_rel_change)
    c = cur.select(
        "col", "q",
        F.col("lo").cast("double").alias("cur_lo"),
        F.col("hi").cast("double").alias("cur_hi"),
    )
    p = prev.select(
        "col", "q",
        F.col("lo").cast("double").alias("prev_lo"),
        F.col("hi").cast("double").alias("prev_hi"),
    )
    j = p.join(c, ["col", "q"], "full_outer")
    present = (
        F.col("cur_lo").isNotNull()
        & F.col("prev_lo").isNotNull()
        & F.col("cur_hi").isNotNull()
        & F.col("prev_hi").isNotNull()
    )
    grew = F.col("cur_lo") > F.col("prev_hi") * (1.0 + t)
    shrank = F.col("cur_hi") < F.col("prev_lo") / (1.0 + t)
    return j.select(
        "col",
        "q",
        "prev_lo",
        "prev_hi",
        "cur_lo",
        "cur_hi",
        F.coalesce(present & ~grew & ~shrank, F.lit(False)).alias("ok"),
    ).orderBy("col", "q")
