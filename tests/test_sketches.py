"""Approximate-sketch scale paths: bounded error vs the exact operators.

The declared queries stay exact (oracle-checkable); these tests pin the
approximate twins a 100 TB deployment would switch to — HyperLogLog
(`approx_count_distinct`) and t-digest (`approx_percentile`) — against
their exact counterparts with the error bounds the sketches guarantee.
Sketches are not cross-engine deterministic, which is exactly why they are
test-pinned rather than oracle-declared (same policy as chunk_documents).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECTNESS


def _events(spark):
    from vector_graph_rag_spark.sources.tables import load_table

    return load_table(spark, SF_CORRECTNESS, "events")


def test_hll_distinct_within_rsd(spark):
    e = _events(spark)
    row = e.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
    ).collect()[0]
    assert row["exact"] > 0
    rel_err = abs(row["approx"] - row["exact"]) / row["exact"]
    # rsd=0.05 is one standard deviation; 3x is a generous deterministic bound.
    assert rel_err < 0.15, f"HLL error {rel_err:.3f} vs exact {row['exact']}"


def test_hll_distinct_per_group_within_rsd(spark):
    e = _events(spark)
    both = (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
        )
        .collect()
    )
    assert len(both) > 0
    for row in both:
        rel_err = abs(row["approx"] - row["exact"]) / max(row["exact"], 1)
        assert rel_err < 0.15, f"{row['event_type']}: HLL error {rel_err:.3f}"


def test_tdigest_percentiles_within_tolerance(spark):
    e = _events(spark)
    row = e.agg(
        F.expr("percentile(value, array(0.5, 0.9))").alias("exact"),
        F.expr("approx_percentile(value, array(0.5, 0.9), 1000)").alias("approx"),
    ).collect()[0]
    spread = (
        e.agg(F.max("value") - F.min("value")).collect()[0][0]
    )
    for exact, approx in zip(row["exact"], row["approx"]):
        # accuracy=1000 → rank error ≤ 1/1000; allow 1% of the value spread.
        assert abs(approx - exact) <= 0.01 * spread, (exact, approx)


def test_compact_graph_single_file_per_table(spark, tmp_path):
    from vector_graph_rag_spark.queries.graphrag import _graph
    from vector_graph_rag_spark.sources.catalog import TABLE_NAMES, GraphCatalog
    from tests.conftest import SF_SMOKE

    g = _graph(spark, SF_SMOKE)
    cat = GraphCatalog(str(tmp_path))
    cat.write_graph("compact_me", g, partitions=4)
    before = cat.graph_stats(spark, "compact_me")
    files = cat.compact_graph(spark, "compact_me", target_files=1)
    assert set(files) == set(TABLE_NAMES)
    assert all(n == 1 for n in files.values()), files
    after = cat.graph_stats(spark, "compact_me")
    assert before == after
