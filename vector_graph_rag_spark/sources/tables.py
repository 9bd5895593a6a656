"""Parquet sources for the driver's deterministic synthetic tables.

TPC-H-ish star schema + events/documents/embeddings (TESTDATA.md).  Plain
``spark.read.parquet`` — Catalyst handles column pruning and predicate
pushdown into the scan, which is the 100 TB-scale story: a query that needs
2 columns of lineitem reads 2 columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Older testdata wrote events.ts as parquet TIMESTAMP(NANOS), which
        # Spark's vectorized reader rejects.  Read nanos as long (legacy
        # conf), then convert to a microsecond timestamp JVM-side (integer
        # div — no double round-trip, nanos exceed 2^53).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F

    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Current testdata writes naive micros (isAdjustedToUTC=false), which
    # Spark ≥3.4 infers as TIMESTAMP_NTZ.  NTZ breaks unix_micros/cast(long)
    # and the whole time-series operator family.  Pin the session to UTC and
    # cast NTZ → TIMESTAMP: value-preserving (UTC wall clock == UTC instant)
    # and identical to DuckDB's naive-timestamp view of the same file.
    # CONTRACT: the NTZ→TIMESTAMP cast resolves the session timezone at
    # ACTION time, not here — it is only value-preserving under UTC.  The
    # project session factory (session.py) pins UTC at build.  For an
    # externally created session on any other zone (explicit or the JVM
    # default — indistinguishable through conf.get) we PIN UTC here and warn:
    # the pin happens before any action touching these columns, so the cast
    # always resolves under UTC and results cannot silently shift.  Callers
    # that need a non-UTC session zone must load events themselves.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
        if tz not in ("UTC", "Etc/UTC", "GMT"):
            import warnings

            warnings.warn(
                f"load_table: pinning spark.sql.session.timeZone=UTC (was "
                f"{tz!r}) to read TIMESTAMP_NTZ testdata; timestamps in "
                f"other frames of this session will now render in UTC",
                stacklevel=2,
            )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        for c in ntz_cols:
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
