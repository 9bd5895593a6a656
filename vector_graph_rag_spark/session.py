"""SparkSession factory tuned for this engine.

Local testing runs `local[N]` in one JVM; the configs below are chosen so the
same code is correct on a 1000-executor cluster at 100 TB:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast conversion) — the single most important scale knob.
- shuffle.partitions sized to cores locally; at cluster scale AQE's
  `advisoryPartitionSizeInBytes` governs and the static number only seeds
  the initial plan.
- Arrow enabled: every Python-side operator in this engine is Arrow-batched
  (pandas_udf / mapInPandas); row-at-a-time UDFs are banned in the hot path.
- session timezone pinned UTC so results are reproducible and oracle
  (DuckDB) comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vector_graph_rag_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
