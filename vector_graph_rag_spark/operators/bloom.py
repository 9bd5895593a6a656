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

Hashing (Kirsch-Mitzenmacher 2006, "Less Hashing, Same Performance"): the
k probe positions are ``pos_i = (h1 + i*h2) mod n_bits`` from TWO
independent md5-derived bases — ``hash60`` (md5 hex 1-15) and ``hash60b``
(md5 hex 16-30).  The r6 scheme derived all k positions as affine
functions of ONE base reduced mod 2^31-1, so any base collision hit all k
bits at once: a false-positive floor of ~n/2^31 independent of n_bits/k
(ADVICE r6).  With two bases a probe only aliases an inserted item when
BOTH reduced bases collide — the full-vector collision space is
m*(m/2) ≈ n_bits^2/2, and the residual floor n/(m*(m/2)) is folded into
``fpp_est`` below.  The step is forced ODD via ``2*(h2 mod m/2) + 1``
(ADVICE r7): n_bits is a multiple of 64, so an odd step is coprime to m
and the k probes always hit k distinct bits — the earlier non-zero-only
step (``% (m-1) + 1``) could share a factor with a power-of-two m (e.g.
step = m/2 collapses the probes to 2 distinct bits for ~3/m of items).

Spark-native construction, no UDFs anywhere:

- build: one md5 per item → (h1, h2) → k bit positions → one
  map-side-combined ``groupBy(word_index)`` with ``bit_or`` — the filter is
  aggregated AS a bit array, shuffle volume = set bits, never items.
- probe: the packed bit array rides a 1-row broadcast (BroadcastNestedLoop
  of a single row — constant cost), and the k probes are pure JVM
  ``element_at`` + ``bit_get`` column expressions inside whole-stage
  codegen.

Sizing: fpp ≈ (1 - e^(−k·n/m))^k + n/(m·(m-1)); 10 bits/item at k=7
gives ~1% with the collision term negligible below ~10^12 items at
10^10 bits.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_graph_rag_spark.functions.hashing import hash60, hash60b

_WORD_BITS = 64


def _positions(base: Column, step: Column, n_bits: int, k: int) -> list[Column]:
    """Kirsch-Mitzenmacher probe positions (h1 + i*h2) mod m, i in [0, k)."""
    return [(base + F.lit(i) * step) % F.lit(n_bits) for i in range(k)]


def _base_step(c: Column, n_bits: int) -> tuple[Column, Column]:
    """(h1 mod m, 2*(h2 mod m/2) + 1) — independent base and ODD step
    (coprime to the even m, so k probes hit k distinct bits)."""
    return (
        hash60(c) % F.lit(n_bits),
        (hash60b(c) % F.lit(n_bits // 2)) * F.lit(2) + F.lit(1),
    )


def build_bloom(
    df: DataFrame, col: str, n_bits: int = 1 << 20, k: int = 7
) -> dict:
    """Aggregate the distinct values of ``df[col]`` into a Bloom filter.

    Returns ``{"words": list[int] (n_bits/64 packed longs), "n_bits", "k",
    "n_items", "fpp_est"}``.  One shuffle, sized by set bits (≤ k·items
    rows into a map-side-combined ``bit_or``); driver state is the packed
    array (n_bits/64 longs — 128 KiB for the default 2^20 bits).
    Items are deduplicated on the full 120-bit (h1, h2) identity before
    counting, so ``n_items`` is exact up to 120-bit collisions.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    if n_bits % _WORD_BITS:
        raise ValueError("n_bits must be a multiple of 64")
    # lazy checkpoint (r17): the count below and the words collect are two
    # separate actions over the same distinct subtree — without the cut the
    # whole hash+distinct pipeline executed twice (guide §2.4)
    items = df.select(
        hash60(F.col(col)).alias("g1"), hash60b(F.col(col)).alias("g2")
    ).distinct().localCheckpoint(eager=False)
    n_items = items.count()
    base = F.col("g1") % F.lit(n_bits)
    step = (F.col("g2") % F.lit(n_bits // 2)) * F.lit(2) + F.lit(1)
    positions = items.select(
        F.explode(F.array(*_positions(base, step, n_bits, k))).alias("pos")
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
    # classic occupancy term + the two-base full-vector collision floor
    fpp = (
        (1.0 - math.exp(-k * n_items / n_bits)) ** k
        + n_items / (float(n_bits) * (n_bits / 2.0))
        if n_items
        else 0.0
    )
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
    from vector_graph_rag_spark.functions.literals import inline_rows

    arr = inline_rows(
        spark, [(bloom["words"],)], f"{alias} array<bigint>"
    )
    return df.crossJoin(F.broadcast(arr))


def might_contain(col: str | Column, bloom: dict, alias: str = "__bloom") -> Column:
    """Membership test expression over a frame prepared by
    :func:`with_bloom`: k pure-JVM probes (element_at + bit_get).
    False negatives: never.  False positives: ~fpp_est.
    """
    c = F.col(col) if isinstance(col, str) else col
    base, step = _base_step(c, bloom["n_bits"])
    checks = []
    for pos in _positions(base, step, bloom["n_bits"], bloom["k"]):
        word = F.element_at(F.col(alias), (pos / _WORD_BITS).cast("int") + 1)
        # bit_get takes a COLUMN position (python-API shiftleft does not)
        checks.append(F.bit_get(word, (pos % _WORD_BITS).cast("int")) == 1)
    out = checks[0]
    for chk in checks[1:]:
        out = out & chk
    return out
