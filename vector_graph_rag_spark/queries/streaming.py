"""Streaming query declarations (north-star extension; reference has none)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from vector_graph_rag_spark.queries import register
from vector_graph_rag_spark.queries.sql_common import dec
from vector_graph_rag_spark.streaming.ingest import windowed_event_aggregate

_STREAM_SQL = f"""
SELECT CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS window_start_epoch,
       event_type,
       COUNT(*) AS n,
       CAST(SUM({dec('value', 6)}) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register(
    "stream_tumbling_30m",
    oracle=_STREAM_SQL,
    description="Structured Streaming tumbling-window agg with watermark (streaming/ingest.py)",
)
def stream_tumbling_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_event_aggregate(
        spark, os.path.join(sf_dir, "events.parquet"), window_duration="30 minutes"
    )
