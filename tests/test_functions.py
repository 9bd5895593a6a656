"""Unit tests for the scalar kernel — reference-semantics fidelity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_normalize_phrase_matches_reference_semantics(spark):
    """processing_phrases (extractor.py:17-28): lower, non-alnum→space,
    strip ends only — internal multi-spaces preserved."""
    import re

    def reference_impl(s: str) -> str:
        return re.sub(r"[^A-Za-z0-9 ]", " ", s.lower()).strip()

    from vector_graph_rag_spark.functions.text import normalize_phrase

    cases = [
        "Hello, World!",
        "  padded  ",
        "UPPER-case_mix",
        "a.b,c;d",
        "double  space kept",
        "中文 CJK chars",
        "",
        "trailing! ",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string").select(
        "s", normalize_phrase("s").alias("n")
    )
    for row in df.collect():
        assert row.n == reference_impl(row.s), row


def test_ids_deterministic_and_case_insensitive(spark):
    from vector_graph_rag_spark.functions.text import entity_id

    df = spark.createDataFrame(
        [("Apple",), ("apple",), ("APPLE!",)], "name string"
    ).select(entity_id("name").alias("id"))
    ids = {r.id for r in df.collect()}
    assert len(ids) == 1  # case-insensitive dedup key (builder.py:76-85)


def test_hash60_matches_duckdb():
    import duckdb

    from vector_graph_rag_spark.functions.hashing import hash60_sql

    con = duckdb.connect()
    v = con.execute("SELECT " + hash60_sql("'hello'")).fetchone()[0]
    assert v >= 0


def test_hash60_spark_duckdb_parity(spark):
    import duckdb

    from vector_graph_rag_spark.functions.hashing import (
        hash60,
        hash60_sql,
        seeded_hash60,
        seeded_hash60_sql,
    )

    words = ["hello", "world", "Spark SQL", "ünïcode", "123", ""]
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w", hash60("w").alias("h"), seeded_hash60("w", 3).alias("h3")
    )
    got = {r.w: (r.h, r.h3) for r in df.collect()}
    con = duckdb.connect()
    for w in words:
        expected = con.execute(
            f"SELECT {hash60_sql('?')}, {seeded_hash60_sql('?', 3)}", [w, w]
        ).fetchone()
        assert got[w] == expected, w


def test_cosine_zero_guard(spark):
    from vector_graph_rag_spark.functions.vector import cosine

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    ).select(cosine("a", "b").alias("c"))
    vals = [r.c for r in df.collect()]
    assert vals == [0.0, 1.0]
