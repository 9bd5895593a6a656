"""Fixed-block token packing — the final tensor-prep step of a
pretraining data pipeline.

GPT-style training consumes the corpus as one virtual token stream:
every document's token ids plus an end-of-document sentinel are
concatenated in a deterministic order and sliced into fixed-length
blocks (Brown et al. 2020 §2.1 "documents are packed into sequences of
1024 tokens with a special end-of-text token").  The existing
`queries/curation.py::sequence_packing` is the *greedy per-shard* packer
(documents kept whole); this operator is the *exact concat-and-slice*
layout — documents SPAN block boundaries, nothing is padded, the
trailing partial block is dropped — and its result is a pure function of
(corpus, block_len, eod_id), bit-identical under any partitioning
(twin-tested against a straight-line Python concatenation).

Scale design — the whole point of doing this in Spark:

1. **Global offsets without a global sort.** Each document needs its
   start position in the virtual stream = the sum of all earlier
   documents' lengths.  That is a distributed prefix sum, done the
   classic two-pass way: ``repartitionByRange(doc order)`` (the one
   sort-shuffle; range exchange, never SinglePartition) → per-partition
   running totals via a window PARTITIONED by Spark partition id
   (parallel) → the ≤ num-partitions partition totals go to the driver,
   whose cumulative sums come back as a broadcast map of per-partition
   base offsets.  Driver state is O(partitions), never O(rows).
2. **Row-local block slicing.**  A document starting at global offset
   ``s`` with ``L`` tokens overlaps blocks ``s div B .. (s+L-1) div B``;
   the (block, sub-slice) pairs are generated ROW-LOCALLY with
   ``sequence``/``transform`` over the id array — tokens are never
   exploded one-per-row.  A document touches at most ``L/B + 1``
   blocks, so the explode fan-out is ~n_tokens/B rows total.
3. **One grouped assembly shuffle.**  ``groupBy(block_id)`` collects
   each block's few slices (``array_sort`` by start offset, then
   ``flatten``) — shuffle volume = the token ids themselves, once; the
   unavoidable cost of a full re-layout.

Total: two corpus shuffles (range partition + block assembly), all JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_graph_rag_spark.functions.hashing import hash60


def pack_fixed_blocks(
    encoded: DataFrame,
    block_len: int,
    eod_id: int,
    id_col: str = "doc_id",
    ids_col: str = "ids",
    partitions: int | None = None,
) -> DataFrame:
    """(doc_id, ids array<int>) → (block_id, ids array<int> of exactly
    ``block_len``) — the corpus as contiguous fixed-length training
    blocks, documents concatenated in ``doc_id`` order, each followed by
    ``eod_id``; the trailing partial block is dropped.

    Deterministic: block contents are a pure function of the corpus and
    the two parameters (CI: bit-identical under repartitioning).
    """
    if block_len < 1:
        raise ValueError(f"block_len must be >= 1 (got {block_len})")
    # NULL id arrays are treated as empty documents (they contribute only
    # their eod): without the coalesce, size(NULL) = -1 poisons L and the
    # NULL sub-slices would silently delete the containing blocks
    ids = F.coalesce(
        F.col(ids_col), F.array().cast(encoded.schema[ids_col].dataType)
    )
    with_len = encoded.select(
        F.col(id_col).alias("doc_id"),
        F.concat(ids, F.array(F.lit(eod_id))).alias("a"),
        (F.size(ids) + 1).cast("long").alias("L"),
    )
    n_parts = partitions or encoded.rdd.getNumPartitions()
    # pass 1: per-partition running totals (window PARTITIONED by pid —
    # parallel, no SinglePartition) and per-partition grand totals.
    # Materialized once: the totals action below and the final assembly
    # both consume it (the apply_eviction multi-consumer pattern).
    w = Window.partitionBy("pid").orderBy("doc_id")
    local = (
        with_len.repartitionByRange(n_parts, "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .withColumn("local_end", F.sum("L").over(w))  # prefix incl. this row
        # lazy (r17): the totals collect below materializes it
        .localCheckpoint(eager=False)
    )
    totals = {
        r["pid"]: r["tot"]
        for r in local.groupBy("pid").agg(F.max("local_end").alias("tot")).collect()
    }
    if not totals:
        return local.select(
            F.lit(0).cast("long").alias("block_id"), "a"
        ).withColumnRenamed("a", "ids").limit(0)
    # driver: cumulative base offset per partition (O(partitions) state);
    # range partitioning orders pids by doc_id range, so accumulate in
    # ascending pid order
    bases, acc = {}, 0
    for pid in sorted(totals):
        bases[pid] = acc
        acc += totals[pid]
    base_map = F.create_map(
        *[F.lit(x) for kv in bases.items() for x in kv]
    )
    placed = local.select(
        "a",
        "L",
        (base_map[F.col("pid")] + F.col("local_end") - F.col("L")).alias("s"),
    )
    # pass 2: row-local (block, sub-slice) generation — a doc starting at
    # s covers blocks s div B .. (s+L-1) div B; slice bounds are plain
    # arithmetic on the array, tokens never explode one-per-row.  Block
    # indices use exact integer `div`, never float division.
    B = F.lit(block_len)
    spans = placed.select(
        F.explode(
            F.transform(
                F.sequence(
                    F.expr(f"s div {block_len}"),
                    F.expr(f"(s + L - 1) div {block_len}"),
                ),
                lambda b: F.struct(
                    b.alias("block_id"),
                    F.greatest(F.col("s"), b * B).alias("frm"),
                    F.slice(
                        F.col("a"),
                        (F.greatest(F.col("s"), b * B) - F.col("s") + 1).cast("int"),
                        (
                            F.least(F.col("s") + F.col("L"), (b + 1) * B)
                            - F.greatest(F.col("s"), b * B)
                        ).cast("int"),
                    ).alias("sub"),
                ),
            )
        ).alias("sp")
    ).select("sp.block_id", "sp.frm", "sp.sub")
    assembled = (
        spans.groupBy("block_id")
        .agg(
            F.flatten(
                F.array_sort(F.collect_list(F.struct("frm", "sub"))).sub
            ).alias("ids")
        )
        .filter(F.size("ids") == block_len)  # drop the trailing partial
    )
    return assembled.select("block_id", "ids")


def shuffle_blocks(blocks: DataFrame, seed: int = 0) -> DataFrame:
    """Deterministic epoch shuffle of the packed blocks: global sort by a
    seeded md5 hash of the block id (ties impossible — ids are unique).

    Training wants a different block order per epoch, reproducible across
    retries and cluster sizes; sorting by ``hash60(seed || block_id)`` is
    a parallel range sort (never SinglePartition) whose order is a pure
    function of (blocks, seed).  Writers persist in this order; a new
    ``seed`` gives an independent permutation of the SAME blocks.
    """
    key = hash60(F.concat(F.lit(f"epoch{seed}\x01"), F.col("block_id").cast("string")))
    return blocks.orderBy(key, "block_id")
