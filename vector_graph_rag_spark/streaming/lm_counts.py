"""Incremental n-gram LM maintenance from a document stream.

The CCNet-style quality filter (`operators/lm_filter.py`) scores candidates
under an n-gram LM trained on a trusted corpus.  In production that trusted
corpus GROWS — new vetted shards land continuously — and retraining from
scratch per shard is a full-corpus pass.  n-gram counts are additive, so
the streaming-native maintenance is: count each micro-batch, store the
counts, aggregate at model-build time.

Design (append-only shard layout, not read-modify-write):

- Each micro-batch writes its unigram/bigram count tables to
  ``state_dir/{uni,bi}/batch=<batch_id>`` with ``mode=overwrite`` — a
  REPLAYED batch id overwrites its own shard, so delivery is idempotent
  under the stream's checkpoint (the same guarantee Structured Streaming's
  file sink gives; a read-modify-write merge would double-count on
  replay).
- ``lm_from_counts`` reads the shard tree and aggregates (``groupBy`` sum)
  into exactly the tables ``train_bigram_lm`` builds — counts are
  integers, so the derived model is BIT-IDENTICAL to batch training on the
  union corpus (test-pinned: cross-entropy scores equal exactly, not
  approximately).
- Shard files are vocab-sized, not corpus-sized; compaction (periodically
  rewriting the shard tree as one aggregated table under a new batch dir)
  is the same maintenance shape as ``sources/catalog.compact_graph``.

Scale: per micro-batch cost is one map-side-combined count over the batch;
model-build cost is a vocab-sized aggregation over shards.  The corpus is
never re-read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_graph_rag_spark.operators.lm_filter import _bigrams, _unigrams


def write_batch_counts(
    batch_df: DataFrame, state_dir: str, batch_id: int, text_col: str = "text"
) -> None:
    """Count one micro-batch and overwrite its shard — idempotent per
    batch id (exposed for tests and backfills; the stream calls this).
    The unigram and bigram count writes land in DISJOINT dirs with no
    read between them — overlapped (guide §2.6, r18) so the second
    count's scan back-fills the first write's committer tail."""
    from vector_graph_rag_spark.functions.concurrency import run_overlapped

    uni = _unigrams(batch_df, text_col).groupBy("tok").agg(
        F.count("*").alias("c_uni")
    )
    bi = _bigrams(batch_df, text_col).groupBy("prev", "tok").agg(
        F.count("*").alias("c_bi")
    )
    run_overlapped(
        [
            lambda: uni.write.mode("overwrite").parquet(
                os.path.join(state_dir, "uni", f"batch={batch_id}")
            ),
            lambda: bi.write.mode("overwrite").parquet(
                os.path.join(state_dir, "bi", f"batch={batch_id}")
            ),
        ]
    )


def stream_lm_counts(
    spark: SparkSession,
    docs_dir: str,
    state_dir: str,
    text_col: str = "text",
    max_files_per_trigger: int = 1,
) -> int:
    """Stream parquet document files into the count-shard tree; returns
    micro-batches processed.  Bounded drain (``availableNow``) for tests
    and backfills; a live pipeline adds a ``checkpointLocation`` so batch
    ids are stable across restarts and replays stay idempotent.
    """
    schema = spark.read.parquet(docs_dir).schema
    n_batches = [0]

    def _write(batch_df, batch_id: int) -> None:
        write_batch_counts(batch_df, state_dir, batch_id, text_col)
        n_batches[0] += 1

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
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


def lm_from_counts(spark: SparkSession, state_dir: str, alpha: float = 0.1) -> dict:
    """Aggregate the shard tree into the exact ``train_bigram_lm`` model
    dict — same tables, same smoothing arithmetic, bit-identical scores."""
    # lazy checkpoints (r17): uni_counts feeds the totals collect AND the
    # p_uni projection; bi feeds the context agg AND the join side — each
    # shard aggregation executed twice without the cut (the
    # ngram_jaccard_pairs repeated-subtree finding).  The totals collect
    # below (still inside this call, before any scratch cleanup)
    # materializes uni_counts; the caller's first action materializes bi.
    uni_counts = (
        spark.read.parquet(os.path.join(state_dir, "uni"))
        .groupBy("tok")
        .agg(F.sum("c_uni").alias("c_uni"))
        .localCheckpoint(eager=False)
    )
    bi = (
        spark.read.parquet(os.path.join(state_dir, "bi"))
        .groupBy("prev", "tok")
        .agg(F.sum("c_bi").alias("c_bi"))
        .localCheckpoint(eager=False)
    )
    ctx = bi.groupBy("prev").agg(F.sum("c_bi").alias("c_prev"))
    bi = bi.join(ctx, "prev")
    total, vocab = uni_counts.agg(
        F.sum("c_uni").alias("t"), F.count("*").alias("v")
    ).collect()[0]
    total, vocab = total or 0, vocab or 0
    uni = uni_counts.select(
        "tok",
        (
            (F.col("c_uni") + F.lit(alpha))
            / F.lit(float(total) + alpha * (int(vocab) + 1))
        ).alias("p_uni"),
    )
    return {
        "uni": uni,
        "bi": bi,
        "vocab_size": int(vocab),
        "total_tokens": int(total),
        "alpha": float(alpha),
    }
