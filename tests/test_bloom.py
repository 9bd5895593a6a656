"""Bloom filter — no false negatives, bounded false positives, JVM-only
plan, and the scaled decontamination integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_graph_rag_spark.operators.bloom import build_bloom, might_contain, with_bloom


@pytest.fixture(scope="module")
def members(spark):
    return spark.createDataFrame(
        [(f"member_{i}",) for i in range(2000)], "v string"
    )


@pytest.fixture(scope="module")
def bloom(members):
    return build_bloom(members, "v", n_bits=1 << 16, k=7)


def test_no_false_negatives(spark, members, bloom):
    probed = with_bloom(members, bloom).withColumn(
        "hit", might_contain("v", bloom)
    )
    assert probed.filter(~F.col("hit")).count() == 0


def test_false_positive_rate_near_theory(spark, bloom):
    others = spark.createDataFrame(
        [(f"absent_{i}",) for i in range(20000)], "v string"
    )
    fp = (
        with_bloom(others, bloom)
        .filter(might_contain("v", bloom))
        .count()
    )
    rate = fp / 20000
    # theory: (1 - e^(-7*2000/65536))^7 ≈ 5.5e-6 per probe set at this
    # loading; allow a generous factor for hash clustering
    assert bloom["fpp_est"] < 0.01
    assert rate <= max(10 * bloom["fpp_est"], 0.005), (rate, bloom["fpp_est"])


def test_duplicates_do_not_double_count(spark):
    dup = spark.createDataFrame([("x",), ("x",), ("y",)], "v string")
    b = build_bloom(dup, "v", n_bits=1 << 10, k=3)
    assert b["n_items"] == 2  # distinct before counting/loading


def test_positions_match_python_twin(spark):
    """The Kirsch-Mitzenmacher positions (h1 + i*h2) mod m from the two
    disjoint md5 halves (ADVICE r6 fix) — pinned against a pure-Python
    twin, which also certifies the arithmetic a DuckDB oracle replays."""
    import hashlib

    from vector_graph_rag_spark.operators.bloom import _base_step, _positions

    m, k = 1 << 12, 5
    vals = ["alpha", "benchmark gram", "x", "äöü"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    base, step = _base_step(F.col("v"), m)
    got = {
        r["v"]: list(r["ps"])
        for r in df.select(
            "v", F.array(*_positions(base, step, m, k)).alias("ps")
        ).collect()
    }
    for v in vals:
        hx = hashlib.md5(v.encode()).hexdigest()
        h1, h2 = int(hx[0:15], 16), int(hx[15:30], 16)
        b, s = h1 % m, (h2 % (m // 2)) * 2 + 1
        assert got[v] == [(b + i * s) % m for i in range(k)], v


def test_step_always_odd_k_validated(spark):
    """2*(h2 mod m/2) + 1 is odd in [1, m-1]: odd steps are coprime to the
    power-of-two m, so the k probes always hit k distinct bits (ADVICE r7
    — the old non-zero-only step could collapse to 2 bits at step=m/2)."""
    df = spark.createDataFrame([(f"s{i}",) for i in range(500)], "v string")
    m = 1 << 10
    _, step = _imported_base_step(df, m)
    rows = step.agg(F.min("s"), F.max("s"),
                    F.sum((F.col("s") % 2 == 0).cast("int"))).collect()[0]
    lo, hi, evens = rows
    assert lo >= 1 and hi <= m - 1 and evens == 0
    with pytest.raises(ValueError, match="k must be >= 1"):
        build_bloom(df, "v", n_bits=1 << 10, k=0)


def _imported_base_step(df, m):
    from vector_graph_rag_spark.operators.bloom import _base_step

    base, step = _base_step(F.col("v"), m)
    return df.select(base.alias("b")), df.select(step.alias("s"))



def test_plan_is_jvm_only_broadcast(spark, members, bloom):
    probed = with_bloom(members, bloom).withColumn(
        "hit", might_contain("v", bloom)
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Broadcast" in plan  # the 1-row bitset join broadcasts


def test_bloom_decontamination_superset_of_exact(spark):
    """Bloom-gated decontamination must drop a SUPERSET of the exact gate's
    drops (false positives over-drop; false negatives would leak benchmark
    text and must not exist)."""
    from vector_graph_rag_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    # benchmark set: 5-grams of every 20th doc (the curation-query shape)
    grams = lambda d: d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(split(text, ' ')) - 4, 0)),"
                " i -> concat_ws(' ', slice(split(text, ' '), i, 5)))"
            )
        ).alias("g"),
    )
    bench = grams(docs.filter(F.col("doc_id") % 20 == 0)).select("g").distinct()
    doc_grams = grams(docs)

    exact_hits = set(
        r["doc_id"]
        for r in doc_grams.join(bench, doc_grams.g == bench.g, "left_semi")
        .select("doc_id")
        .distinct()
        .collect()
    )
    b = build_bloom(bench, "g", n_bits=1 << 18, k=7)
    bloom_hits = set(
        r["doc_id"]
        for r in with_bloom(doc_grams, b)
        .filter(might_contain("g", b))
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert exact_hits <= bloom_hits  # no false negatives, ever
    # and the over-drop is small at this loading
    assert len(bloom_hits - exact_hits) <= max(5, len(exact_hits) // 10)
