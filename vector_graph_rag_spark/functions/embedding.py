"""Embedding operators — pluggable backends + deterministic mock.

The reference embeds via HF (mean-pooling, 512-token truncation, L2
normalize — embeddings.py:53-63,134-143) or OpenAI (empty-text → zero
vector, embeddings.py:180-203), always L2-normalized so IP == cosine.

Spark shape: an Arrow-batched pandas UDF wrapping a pluggable encoder.
For correctness runs the encoder is the deterministic HASH MOCK
(FIXTURES.md §1.5): element i = seeded_hash60(text, i) / P ∈ [0,1), then
L2 normalize; the empty-string → zero-vector guard is preserved.  The mock
is also expressible as a pure Column expression (and as DuckDB SQL), which
is what the oracle-checked queries use — the pandas UDF path exists for
real model backends.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_graph_rag_spark.functions.hashing import (
    MERSENNE_P,
    seeded_hash60,
    seeded_hash60_sql,
)
from vector_graph_rag_spark.functions.vector import l2_normalize


def mock_embedding(col: Column | str, dim: int = 8) -> Column:
    """Deterministic unit vector from text (JVM-side, oracle-checkable).

    Empty/blank text → zero vector (OpenAI guard, embeddings.py:180-203).
    Element i hashes "{i}|{text}" so dimensions are independent.
    """
    c = F.col(col) if isinstance(col, str) else col
    raw = F.array(
        *[
            seeded_hash60(F.concat(F.lit(f"{i}|"), c), i % 32).cast("double")
            / F.lit(float(MERSENNE_P))
            for i in range(dim)
        ]
    )
    zero = F.array(*[F.lit(0.0) for _ in range(dim)])
    return F.when(F.trim(c) == "", zero).otherwise(l2_normalize(raw))


def mock_embedding_sql(expr: str, dim: int = 8) -> str:
    """DuckDB twin of :func:`mock_embedding` (pre-normalization handled
    with an inline norm subexpression)."""
    raw = []
    for i in range(dim):
        keyed = "('{0}|' || {1})".format(i, expr)
        raw.append(
            f"(CAST({seeded_hash60_sql(keyed, i % 32)} AS DOUBLE) / {float(MERSENNE_P)!r})"
        )
    raw_list = "[" + ", ".join(raw) + "]"
    norm = f"sqrt(list_dot_product({raw_list}, {raw_list}))"
    unit = "[" + ", ".join(f"({e} / {norm})" for e in raw) + "]"
    zero = "[" + ", ".join("0.0" for _ in range(dim)) + "]"
    return f"(CASE WHEN trim({expr}) = '' THEN {zero} ELSE {unit} END)"


def embed_with_backend(df, text_col: str, encoder, dim: int, output_col: str = "embedding"):
    """Arrow-batched pandas-UDF embedding with a pluggable encoder
    (signature: list[str] -> list[list[float]]), for real model backends.
    Preserves the reference's batch semantics (batch_size is the Arrow
    batch, config.py:120-122) and L2 normalization."""
    import numpy as np
    import pandas as pd

    @F.pandas_udf("array<float>")
    def _embed(texts: pd.Series) -> pd.Series:
        vecs = encoder(list(texts.fillna("")))
        out = []
        for v in vecs:
            a = np.asarray(v, dtype="float32")
            n = float(np.linalg.norm(a))
            out.append((a / n if n > 0 else a).tolist())
        return pd.Series(out)

    return df.withColumn(output_col, _embed(F.col(text_col)))
