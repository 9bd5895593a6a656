"""Structured Streaming ingest — the engine's stream path.

The reference is strictly batch (SURVEY §2.2: no streaming anywhere), so
this is a north-star extension: an append-only event stream aggregated into
tumbling windows with a watermark for late data.  The same logical plan
serves batch (relational.events_tumbling_1h) and stream — Spark's
unification is the point.

For tests/correctness the stream is driven synchronously: file source over
the deterministic events parquet, `availableNow` trigger, memory sink in
`complete` mode (append mode would hold back open windows until the
watermark passes — with a bounded source that means zero output; complete
mode emits every window and stays deterministic).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_aggregate(
    spark: SparkSession,
    events_path: str,
    window_duration: str = "30 minutes",
    watermark: str = "1 hour",
    slide_duration: str | None = None,
) -> DataFrame:
    """readStream(events) → watermark → tumbling/sliding-window count/sum → batch DF.

    ``slide_duration`` < ``window_duration`` makes windows overlap (each
    event lands in window/slide windows); None = tumbling.

    Returns (window_start_epoch, event_type, n, total_value_micros) — value
    sum in exact integer micros so the result is order-independent.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_path).schema
    # The file stream source requires a DIRECTORY; point it at the parent
    # with a glob filter for the single events file.
    base_dir, file_name = os.path.split(events_path)
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", file_name)
        .parquet(base_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    win = (
        F.window("ts", window_duration, slide_duration)
        if slide_duration
        else F.window("ts", window_duration)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value_dec"),
        )
    )
    name = "evt_win_" + uuid.uuid4().hex[:12]
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        if query.isActive:
            query.stop()
    return spark.table(name).select(
        F.col("w.start").cast("long").alias("window_start_epoch"),
        "event_type",
        "n",
        F.col("total_value_dec").cast("double").alias("total_value"),
    )
