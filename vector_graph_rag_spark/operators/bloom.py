"""Distributed Bloom filter — approximate membership for sets too big to
broadcast exactly.

Where it slots into the pipeline: the decontamination gate
(`queries/curation.py`) broadcasts the benchmark n-gram set exactly — right
while that set fits the broadcast threshold.  At 100 TB the "is this in the
set" side can itself be huge (all benchmark grams across every eval suite,
URL/domain blocklists, the already-ingested dedup key space).  A Bloom
filter keeps the membership test broadcast-sized at a chosen false-positive
rate, with NO false negatives — for contamination/blocklist gates a false
positive only over-drops a training document, never leaks a benchmark one.

Spark-native construction, no UDFs anywhere:

- build: k seeded hashes per item (`seeded_hash60`, the md5-derived
  universal-hash family shared with minhash) → bit positions → one
  map-side-combined ``groupBy(word_index)`` with ``bit_or`` — the filter is
  aggregated AS a bit array, shuffle volume = set bits, never items.
- probe: the packed bit array rides a 1-row broadcast (BroadcastNestedLoop
  of a single row — constant cost), and the k probes are pure JVM
  ``element_at`` + bitwise-AND column expressions inside whole-stage
  codegen.

Sizing: fpp ≈ (1 - e^(−k·n/m))^k; 10 bits/item at k=7 gives ~1%.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_graph_rag_spark.functions.hashing import hash60, num_hashes, seeded_hash60_from_base

_WORD_BITS = 64


def build_bloom(
    df: DataFrame, col: str, n_bits: int = 1 << 20, k: int = 7
) -> dict:
    """Aggregate the distinct values of ``df[col]`` into a Bloom filter.

    Returns ``{"words": list[int] (n_bits/64 packed longs), "n_bits", "k",
    "n_items", "fpp_est"}``.  One shuffle, sized by set bits (≤ k·items
    rows into a map-side-combined ``bit_or``); driver state is the packed
    array (n_bits/64 longs — 128 KiB for the default 2^20 bits).
    """
    if k > num_hashes():
        raise ValueError(f"k={k} exceeds the {num_hashes()} seeded hash functions")
    if n_bits % _WORD_BITS:
        raise ValueError("n_bits must be a multiple of 64")
    base = (hash60(F.col(col)) % F.lit(2_147_483_647)).alias("base")
    items = df.select(base).distinct()
    n_items = items.count()
    positions = items.select(
        F.explode(
            F.array(
                *[
                    seeded_hash60_from_base(F.col("base"), i) % F.lit(n_bits)
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    words = (
        positions.select(
            (F.col("pos") / _WORD_BITS).cast("long").alias("w"),
            # python-API shiftleft takes only a literal shift; SQL takes exprs
            F.expr(f"shiftleft(1L, cast(pos % {_WORD_BITS} as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    packed = [0] * (n_bits // _WORD_BITS)
    for row in words:
        packed[int(row["w"])] = int(row["bits"])
    fpp = (1.0 - math.exp(-k * n_items / n_bits)) ** k if n_items else 0.0
    return {
        "words": packed,
        "n_bits": n_bits,
        "k": k,
        "n_items": n_items,
        "fpp_est": fpp,
    }


def with_bloom(df: DataFrame, bloom: dict, alias: str = "__bloom") -> DataFrame:
    """Attach the packed bit array as a broadcast 1-row column ``alias`` —
    constant-cost BroadcastNestedLoop of a single row; call once, then test
    any number of columns with :func:`might_contain`."""
    spark = df.sparkSession
    arr = spark.createDataFrame(
        [(bloom["words"],)], f"{alias} array<bigint>"
    )
    return df.crossJoin(F.broadcast(arr))


def might_contain(col: str | Column, bloom: dict, alias: str = "__bloom") -> Column:
    """Membership test expression over a frame prepared by
    :func:`with_bloom`: k pure-JVM probes (element_at + bitwise AND).
    False negatives: never.  False positives: ~fpp_est.
    """
    c = F.col(col) if isinstance(col, str) else col
    base = hash60(c) % F.lit(2_147_483_647)
    checks = []
    for i in range(bloom["k"]):
        pos = seeded_hash60_from_base(base, i) % F.lit(bloom["n_bits"])
        word = F.element_at(F.col(alias), (pos / _WORD_BITS).cast("int") + 1)
        # bit_get takes a COLUMN position (python-API shiftleft does not)
        checks.append(F.bit_get(word, (pos % _WORD_BITS).cast("int")) == 1)
    out = checks[0]
    for chk in checks[1:]:
        out = out & chk
    return out
