"""Self-check harness mirroring the driver's DuckDB-oracle comparison.

Runs a declared query's Spark implementation and its oracle SQL side by
side, normalizes both to pandas (columns sorted by name, numeric types
widened, -0.0 → 0.0), sorts rows, and compares exactly.  If this passes,
the driver's row-count + schema + order-insensitive value-hash passes too.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from vector_graph_rag_spark.sources.tables import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize_frame(df: pd.DataFrame) -> pd.DataFrame:
    out = {}
    for col in sorted(df.columns):
        s = df[col]
        if s.dtype == object and len(s) > 0 and any(
            isinstance(v, (bytes, bytearray)) for v in s.dropna().head(5)
        ):
            s = s.apply(lambda b: b.hex() if isinstance(b, (bytes, bytearray)) else b)
        if str(s.dtype).startswith(("int", "uint", "Int")):
            s = s.astype("int64")
        elif str(s.dtype).startswith("float"):
            s = s.astype("float64").replace(-0.0, 0.0)
        elif s.dtype == object:
            # Decimal / list / other objects → canonical string
            s = s.apply(_canon_obj)
        elif "datetime" in str(s.dtype):
            s = s.astype("datetime64[us]").astype(str)
        out[col] = s.reset_index(drop=True)
    res = pd.DataFrame(out)
    if len(res):
        res = res.sort_values(by=list(res.columns), kind="mergesort").reset_index(drop=True)
    return res


def _canon_obj(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(str(_canon_obj(x)) for x in v) + "]"
    return v


def compare_query(spark, name: str, sf_dir: str) -> dict:
    """Run one declared query vs its oracle. Returns a result dict."""
    from vector_graph_rag_spark.queries import load_all

    q = load_all(include_retired=True)[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        return {"name": name, "status": "rows_only", "rows": len(sdf)}
    con = duck_connection(sf_dir)
    try:
        ddf = con.execute(q.oracle).df()
    finally:
        con.close()
    s_norm, d_norm = normalize_frame(sdf), normalize_frame(ddf)
    if list(s_norm.columns) != list(d_norm.columns):
        return {
            "name": name,
            "status": "schema_mismatch",
            "spark_cols": list(s_norm.columns),
            "duck_cols": list(d_norm.columns),
        }
    if len(s_norm) != len(d_norm):
        return {
            "name": name,
            "status": "rowcount_mismatch",
            "spark_rows": len(s_norm),
            "duck_rows": len(d_norm),
        }
    if not s_norm.equals(d_norm):
        diff_cols = [
            c for c in s_norm.columns if not s_norm[c].equals(d_norm[c])
        ]
        return {"name": name, "status": "value_mismatch", "diff_cols": diff_cols,
                "spark_head": s_norm.head(3).to_dict("records"),
                "duck_head": d_norm.head(3).to_dict("records")}
    return {"name": name, "status": "ok", "rows": len(s_norm)}
