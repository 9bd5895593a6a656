"""Multi-format document I/O — CSV / JSON(L) / parquet / ORC ingest to one
canonical schema.

The reference ingests documents through file loaders and an HTTP import
route (loaders/__init__.py, api/app.py:423-474); the Spark-native
equivalent is a format-dispatched `spark.read` with an EXPLICIT schema —
`inferSchema` / `multiline` sampling reads the data twice and guesses
types per-file, both non-starters on a 100 TB lake.  All formats land on
the same `documents` schema so every downstream operator is
format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_FORMATS = ("parquet", "csv", "json", "orc")


def read_documents(spark: SparkSession, path: str, format: str = "parquet") -> DataFrame:
    """Read a documents dataset in any supported format to the canonical
    schema (column order normalized, explicit types, no inference)."""
    if format not in _FORMATS:
        raise ValueError(f"unsupported format {format!r}; one of {_FORMATS}")
    reader = spark.read
    if format == "csv":
        # Quote/escape handle embedded delimiters and newlines; header off —
        # column identity comes from the schema, not a header row.
        df = reader.schema(DOCUMENTS_SCHEMA).option("quote", '"').option("escape", '"').csv(path)
    elif format == "json":
        df = reader.schema(DOCUMENTS_SCHEMA).json(path)  # JSONL, splittable
    else:
        df = getattr(reader, format)(path)
    return df.select([F.col(f.name).cast(f.dataType) for f in DOCUMENTS_SCHEMA.fields])


def write_documents(df: DataFrame, path: str, format: str = "parquet") -> None:
    """Write documents in any supported format (CSV quoted/escaped so text
    with delimiters and newlines round-trips)."""
    if format not in _FORMATS:
        raise ValueError(f"unsupported format {format!r}; one of {_FORMATS}")
    out = df.select([f.name for f in DOCUMENTS_SCHEMA.fields])
    w = out.write.mode("overwrite")
    if format == "csv":
        w = w.option("quote", '"').option("escape", '"')
    getattr(w, format)(path)
