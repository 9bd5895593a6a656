"""Data-quality expectations — single-pass evaluation, each constraint's
pass/fail semantics, and the versioned-store commit gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_graph_rag_spark.operators import expectations as X
from vector_graph_rag_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text", "source")


def test_clean_corpus_passes_all(spark, docs):
    results = X.validate(
        docs,
        [
            X.not_null("doc_id"),
            X.unique("doc_id"),
            X.row_count_between(1, 10_000),
            X.matches("source", "^src[0-9]+$"),
            X.in_range("doc_id", 0, 10**9),
        ],
    )
    assert all(r.ok for r in results), [r for r in results if not r.ok]


def test_each_constraint_fails_on_the_right_defect(spark):
    df = spark.createDataFrame(
        [(1, 0.5, "en"), (1, 1.5, "EN"), (None, 0.2, "de")],
        "k long, score double, lang string",
    )
    results = {
        r.name: r
        for r in X.validate(
            df,
            [
                X.not_null("k"),
                X.unique("k"),
                X.in_range("score", 0.0, 1.0),
                X.matches("lang", "^[a-z]{2}$"),
                X.row_count_between(5),
                X.mean_between("score", 0.0, 0.5),
            ],
        )
    }
    assert not results["not_null(k)"].ok and "1 violating" in results["not_null(k)"].observed
    assert not results["unique(k)"].ok  # key 1 twice (NULL not counted distinct-side)
    assert not results["in_range(score, 0.0, 1.0)"].ok
    assert not results["matches(lang, ^[a-z]{2}$)"].ok  # 'EN'
    assert not results["row_count_between(5, None)"].ok
    assert not results["mean_between(score, 0.0, 0.5)"].ok  # mean ~0.73


def test_enforce_raises_listing_all_failures(spark):
    df = spark.createDataFrame([(None, 2.0)], "k long, score double")
    with pytest.raises(X.ExpectationError) as ei:
        X.enforce(df, [X.not_null("k"), X.in_range("score", 0, 1)])
    msg = str(ei.value)
    assert "not_null(k)" in msg and "in_range(score, 0, 1)" in msg
    assert len(ei.value.failures) == 2


def test_single_aggregation_pass(spark, docs):
    """All constraint metrics ride ONE agg — plan has no Python, no
    cartesian, and evaluating 5 checks triggers exactly one job (checked
    via the Spark status tracker job delta)."""
    checks = [
        X.not_null("doc_id"),
        X.in_range("doc_id", 0, 10**9),
        X.matches("source", "^src[0-9]+$"),
        X.row_count_between(1),
        X.mean_between("doc_id", 0, 10**9),
    ]
    docs2 = docs.localCheckpoint(eager=True)  # isolate scan from the count
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    X.validate(docs2, checks)
    after = len(tracker.getJobIdsForGroup(None) or [])
    # one aggregation action; AQE may split partial/final stages into 2
    # jobs, but 5 independently-evaluated checks would cost >= 5
    assert after - before <= 2, f"expected <=2 jobs for 5 checks, got {after - before}"


def test_versioned_store_commit_gate(spark, tmp_path, docs):
    """A violating commit must write NOTHING (write and merge), matching
    Delta table-constraint semantics."""
    import os

    from vector_graph_rag_spark.sources.versioned import VersionedCorpus

    store = VersionedCorpus(spark, str(tmp_path / "gated"))
    good = [X.not_null("text"), X.unique("doc_id")]
    v1 = store.write(docs.select("doc_id", "text"), checks=good)
    assert v1 == 1
    bad_updates = spark.createDataFrame(
        [(0, None)], "doc_id long, text string"
    )
    with pytest.raises(X.ExpectationError, match="not_null"):
        store.merge(bad_updates, checks=good)
    assert store.latest_version() == 1  # nothing committed
    assert not os.path.exists(store._vdir(2))
    # the same updates commit fine without the gate
    assert store.merge(bad_updates) == 2
