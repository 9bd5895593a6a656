"""Persistent incremental inverted term index — the nightly lexical path
that never re-tokenizes the corpus.

``queries/search_api.write_term_index`` materializes the whole corpus's
posting table in one shot; at 100 TB documents arrive nightly, and
re-tokenizing (or rewriting) the accumulated postings per batch is the
cost this module removes.  Each batch's documents are tokenized ONCE and
their (doc_id, term, w) rows land in an overwrite-idempotent shard tree
(the ``streaming/vector_index`` / ``streaming/dedup_index`` contract — a
replayed batch id overwrites its own shard, so delivery is exactly-once
under a streaming checkpoint):

    index_dir/batch=<id>/part-*.parquet   (doc_id, term, w)

Invariants (test-pinned + oracle-gated by the staged
``term_index_incremental`` query, whose oracle is ``sparse_dot_topk``'s
SQL verbatim):

- **incremental == one-shot**: the posting table is a disjoint union over
  doc ids — tokenization is row-local, a document's tf rows live wholly
  inside its batch's shard, and every downstream consumer
  (``sparse_index_search``'s term join + (query, doc) aggregation,
  ``bm25_scores_from_index``'s dl/df/avgdl derivations) is a commutative
  aggregation over posting rows, so ANY sharding of the corpus into
  batches yields byte-identical search results.
- **replay idempotence**: re-appending an existing batch id first deletes
  that batch's shard dir (a metadata-only overwrite would resurface stale
  files and double-count a document's terms), then rewrites it.
- **append-only doc ids**: batches carry NEW documents.  A revised
  document is a delete + re-append of its batch (or a new index) — the
  same contract as the LSH band table.
- **deletes are tombstones** (r15): ``append_doc_tombstones`` marks docs
  deleted without touching sealed shards; the LOGICAL posting table
  (``read_term_index``) anti-joins them, so search scores AND the df/dl/
  avgdl statistics reflect the post-delete corpus; ``compact_term_index``
  removes the postings physically and spends the tombstones (in place) —
  the same lifecycle as ``vector_index.append_tombstones``.

The laziness caveat of ``dedup_index.probe_index`` applies: a search plan
is pinned to the files its scan discovered, so materialize outstanding
searches before REPLAYING a batch id (appends of new ids are safe —
partition discovery happens at read time).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_graph_rag_spark.functions.text import tokens


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), hpath


def list_batch_ids(spark: SparkSession, index_dir: str) -> list[int]:
    """Batch ids present in the index (Hadoop FS — object-store-safe: a
    bad path fails loudly, never 'empty')."""
    fs, root = _fs(spark, index_dir)
    if not fs.exists(root):
        return []
    ids = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch="):
            ids.append(int(name.split("=", 1)[1]))
    return sorted(ids)


def append_term_batch(
    docs: DataFrame,
    index_dir: str,
    batch_id: int,
    text_col: str = "text",
) -> None:
    """Tokenize ONE batch and write its posting shard.  The only shuffle
    is the batch-local tf aggregation + the term-major repartition that
    co-locates each term's batch postings (bounded by BATCH tokens, never
    the accumulated corpus — the whole point)."""
    spark = docs.sparkSession
    # Under-parallel batch guard (see streaming/vector_index.append_to_index):
    # a one-file micro-batch scans as one task and serializes the tokenize
    # map side; the tf groupBy re-parallelizes only after that scan.
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < max(2, par // 2):
        docs = docs.repartition(par)
    fs, _ = _fs(spark, index_dir)
    batch_dir = os.path.join(index_dir, f"batch={batch_id}")
    _, bpath = _fs(spark, batch_dir)
    if fs.exists(bpath):  # replay: physically drop the stale shard first
        fs.delete(bpath, True)
    tf = (
        docs.select("doc_id", F.explode(tokens(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    tf.repartition(F.col("term")).write.mode("overwrite").parquet(batch_dir)


def append_doc_tombstones(
    ids: DataFrame, index_dir: str, batch_id: int, id_col: str = "doc_id"
) -> None:
    """Mark documents DELETED without touching sealed posting shards —
    the lexical sibling of ``vector_index.append_tombstones`` (takedown /
    right-to-be-forgotten): id-only shards under

        index_dir/tombstones/batch=<id>/part-*.parquet   (doc_id)

    with the same overwrite-idempotent replay contract as posting batches.
    The logical posting table (``read_term_index``) anti-joins them, so
    EVERY consumer — search scores, df/dl/avgdl statistics — sees the
    post-delete corpus; ``compact_term_index`` removes the postings
    physically and spends the tombstones."""
    spark = ids.sparkSession
    tomb_dir = os.path.join(index_dir, "tombstones", f"batch={batch_id}")
    fs, tpath = _fs(spark, tomb_dir)
    if fs.exists(tpath):  # replay: drop the stale shard first
        fs.delete(tpath, True)
    ids.select(F.col(id_col).cast("long").alias("doc_id")).write.mode(
        "overwrite"
    ).parquet(tomb_dir)


def list_doc_tombstone_ids(spark: SparkSession, index_dir: str) -> list[int]:
    """Tombstone batch ids present under ``index_dir/tombstones``."""
    root = os.path.join(index_dir, "tombstones")
    fs, rpath = _fs(spark, root)
    if not fs.exists(rpath):
        return []
    return sorted(
        int(st.getPath().getName().split("=", 1)[1])
        for st in fs.listStatus(rpath)
        if st.isDirectory() and st.getPath().getName().startswith("batch=")
    )


def read_doc_tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The union of all doc tombstone shards (None when none exist)."""
    ids = list_doc_tombstone_ids(spark, index_dir)
    if not ids:
        return None
    root = os.path.join(index_dir, "tombstones")
    return spark.read.parquet(
        *[os.path.join(root, f"batch={i}") for i in ids]
    ).select("doc_id").distinct()


def read_term_index(
    spark: SparkSession, index_dir: str, exclude_tombstoned: bool = True
) -> DataFrame:
    """The logical posting table across all batches — (doc_id, term, w)
    plus the ``batch`` partition column (dropped: consumers aggregate over
    postings and must see the one-shot schema).  Batch shards are read by
    EXPLICIT path (a ``tombstones/`` sibling under the index root must not
    enter partition discovery).  Tombstoned documents are anti-joined out
    of the logical table by default, so downstream statistics (df, dl,
    avgdl) as well as scores reflect the post-delete corpus — the
    correctness property a BM25-style consumer needs from deletes."""
    ids = list_batch_ids(spark, index_dir)
    if not ids:
        return spark.createDataFrame([], "doc_id long, term string, w long")
    rows = (
        spark.read.option("basePath", index_dir)
        .parquet(*[os.path.join(index_dir, f"batch={i}") for i in ids])
        .select("doc_id", "term", "w")
    )
    if exclude_tombstoned:
        tombs = read_doc_tombstones(spark, index_dir)
        if tombs is not None:
            rows = rows.join(tombs, "doc_id", "left_anti")
    return rows


def search_term_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id, score, rank) over the incremental index — the
    same broadcast-postings join + map-side-combined (query, doc) dot
    product as ``sparse_index_search``; a term's posting list may span
    batch shards, and the aggregation merges them exactly."""
    from pyspark.sql import Window

    qtf = (
        queries.select(query_id, F.explode(tokens(text_col)).alias("term"))
        .groupBy(query_id, "term")
        .agg(F.count(F.lit(1)).alias("qw"))
    )
    w_rank = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        read_term_index(spark, index_dir)
        .join(F.broadcast(qtf), "term")
        .groupBy(query_id, "doc_id")
        .agg(F.sum(F.col("qw") * F.col("w")).alias("score"))
        .withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rank") <= k)
        .select(query_id, "doc_id", "score", "rank")
    )


def stream_index_documents(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    max_files_per_trigger: int = 1,
    schema: str = "doc_id long, text string",
    text_col: str = "text",
) -> int:
    """Stream parquet document files from ``docs_dir`` into the posting
    index, one ``append_term_batch`` shard per micro-batch (the
    ``streaming/vector_index`` pattern).  Structured Streaming's batch ids
    are monotonically unique under a checkpoint and replays re-deliver the
    SAME id, which lands exactly on the shard tree's overwrite-idempotence
    contract — at-least-once delivery is safe.  Returns the number of
    micro-batches processed.  Bounded run (``availableNow``) for tests /
    backfills; a live pipeline drops the trigger and keeps the
    checkpointLocation."""
    n_batches = [0]

    def _append(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_term_batch(batch_df, index_dir, int(batch_id), text_col=text_col)
        n_batches[0] += 1

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_append)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", os.path.join(index_dir, "_stream_checkpoint")
        )
        .start()
    )
    q.awaitTermination()
    return n_batches[0]


def compact_term_index(
    spark: SparkSession, index_dir: str, out_dir: str, compacted_id: int = 0
) -> int:
    """Merge every posting shard into ONE compacted shard (the lexical
    sibling of ``vector_index.compact_index``): all (doc_id, term, w)
    rows rewritten term-major under ``out_dir/batch=<compacted_id>``.
    Pure I/O — postings are never re-tokenized, and batches are
    doc-disjoint by the append contract, so concatenation IS the merged
    index: a search of the compacted tree returns row-identical results.
    With ``out_dir != index_dir`` the source shards stay intact
    (publish-then-swap); in-place, the source shards are dropped here
    BEFORE the tombstones are spent — the crash-safe ordering
    ``vector_index.compact_index`` documents.  Returns the number of
    source batches merged.

    At 100 TB this bounds the files-per-term growth the nightly appends
    accumulate (a term's posting list spans every batch that saw it)."""
    ids = list_batch_ids(spark, index_dir)
    if not ids:
        return 0
    # read_term_index applies doc tombstones — compaction is their
    # PHYSICAL removal (the vector_index.compact_index semantic).
    rows = read_term_index(spark, index_dir)
    batch_dir = os.path.join(out_dir, f"batch={compacted_id}")
    fs, bpath = _fs(spark, batch_dir)
    if fs.exists(bpath):  # replay-idempotent like append_term_batch
        fs.delete(bpath, True)
    rows.repartition(F.col("term")).write.mode("overwrite").parquet(batch_dir)
    # In-place compaction: drop source shards FIRST, then spend the
    # applied tombstones (ids re-open for legitimate re-indexing) —
    # crash between the two leaves only a harmless no-op tombstone set,
    # never tombstoned postings with a spent record (r15 ADVICE;
    # ordering contract documented at vector_index.compact_index).
    if os.path.abspath(out_dir) == os.path.abspath(index_dir):
        for i in ids:
            if i == compacted_id:
                continue
            sdir = os.path.join(index_dir, f"batch={i}")
            sfs, spath = _fs(spark, sdir)
            if sfs.exists(spath):
                sfs.delete(spath, True)
        troot = os.path.join(index_dir, "tombstones")
        tfs, tpath = _fs(spark, troot)
        if tfs.exists(tpath):
            tfs.delete(tpath, True)
    return len(ids)
