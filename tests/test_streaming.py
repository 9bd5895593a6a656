"""Streaming tests: stateful sessionization agrees with its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_stateful_sessionize_matches_batch(spark):
    from vector_graph_rag_spark.queries import load_all
    from vector_graph_rag_spark.streaming.sessionize import run_sessionize_on_events

    streamed = run_sessionize_on_events(
        spark, f"{SF_SMOKE}/events.parquet"
    ).select(
        "user_id",
        F.col("session_start").cast("long").alias("start_epoch"),
        "n_events",
    )
    s_rows = {(r.user_id, r.start_epoch, r.n_events) for r in streamed.collect()}

    batch = load_all()["sessionize_events"].fn(spark, SF_SMOKE)
    b_rows = {
        (r.user_id, r.session_start, r.n_events)
        for r in batch.select(
            "user_id",
            F.unix_timestamp("session_start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        ).collect()
    }

    # The stream closes a session only when a LATER event arrives for that
    # user (single availableNow batch: no timeout fires), so streamed ==
    # batch minus each user's final session.
    assert s_rows <= b_rows
    last_per_user = {}
    for u, start, n in b_rows:
        if u not in last_per_user or start > last_per_user[u][1]:
            last_per_user[u] = (u, start, n)
    expected = b_rows - set(last_per_user.values())
    assert s_rows == expected
    assert len(s_rows) > 0


def test_event_stream_reads_directory_datasets(spark, tmp_path):
    """At scale events is a partitioned DIRECTORY of part files, not one
    file; _event_stream must stream it directly (the single-file glob
    branch matches leaf file names and would silently read 0 rows — the
    r5 scale-smoke found exactly this)."""
    from vector_graph_rag_spark.sources.tables import load_table
    from vector_graph_rag_spark.streaming.sessionize import run_sessionize_on_events

    events = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_dir.parquet")
    events.repartition(4).write.parquet(out)

    from_dir = run_sessionize_on_events(spark, out)
    from_file = run_sessionize_on_events(spark, f"{SF_SMOKE}/events.parquet")
    key = lambda df: sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in df.collect()
    )
    assert key(from_dir) == key(from_file)
    assert len(key(from_dir)) > 0


def test_streaming_pii_scrub_equals_batch(spark, tmp_path):
    """The curation scrub is a stateless projection, so the identical plan
    must produce identical rows under Structured Streaming — both over the
    single-file testdata shape and a partitioned directory dataset."""
    import uuid

    from vector_graph_rag_spark.queries.curation import (
        pii_redaction_profile,
        pii_scrub_stream,
    )
    from vector_graph_rag_spark.sources.tables import load_table

    docs_dir = str(tmp_path / "docs_dir.parquet")
    load_table(spark, SF_SMOKE, "documents").repartition(4).write.parquet(docs_dir)

    batch = sorted(map(tuple, pii_redaction_profile(spark, SF_SMOKE).collect()))
    assert batch

    for path in (f"{SF_SMOKE}/documents.parquet", docs_dir):
        name = "pii_scrub_" + uuid.uuid4().hex[:12]
        q = (
            pii_scrub_stream(spark, path)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            if q.isActive:
                q.stop()
        assert sorted(map(tuple, spark.table(name).collect())) == batch
