"""Loader plumbing: binaryFile source → converter mapInPandas, file routing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_graph_rag_spark.sources.loaders import (
    convert_binary_documents,
    route_files,
)


def test_route_files_dispatch(spark):
    paths = [
        "https://example.com/page",
        "a/report.PDF",
        "b/doc.docx",
        "c/notes.txt",
        "c/readme.md",
        "d/index.html",
        "e/data.xlsx",
    ]
    listing = spark.createDataFrame([(p,) for p in paths], "path string")
    kinds = {r.path: r.kind for r in route_files(listing).collect()}
    assert kinds == {
        "https://example.com/page": "url",
        "a/report.PDF": "pdf",
        "b/doc.docx": "docx",
        "c/notes.txt": "text",
        "c/readme.md": "text",
        "d/index.html": "html",
        "e/data.xlsx": "unsupported",
    }


def test_convert_binary_text_documents(spark, tmp_path):
    (tmp_path / "a.txt").write_text("hello spark")
    (tmp_path / "b.md").write_text("# title\nbody")
    df = spark.read.format("binaryFile").load(str(tmp_path))
    out = {
        r.path.rsplit("/", 1)[-1]: (r.text, r.n_bytes)
        for r in convert_binary_documents(df).collect()
    }
    assert out["a.txt"] == ("hello spark", 11)
    assert out["b.md"][0].startswith("# title")


def test_convert_binary_unsupported_raises(spark, tmp_path):
    (tmp_path / "x.pdf").write_bytes(b"%PDF-1.4 fake")
    df = spark.read.format("binaryFile").load(str(tmp_path))
    with pytest.raises(Exception) as ei:
        convert_binary_documents(df).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_multiformat_document_roundtrip(spark, tmp_path):
    from tests.conftest import SF_SMOKE
    from vector_graph_rag_spark.sources.formats import read_documents, write_documents
    from vector_graph_rag_spark.sources.tables import load_table

    base = load_table(spark, SF_SMOKE, "documents")
    want = sorted(map(tuple, base.collect()))
    for fmt in ("csv", "json", "orc", "parquet"):
        path = str(tmp_path / f"docs_{fmt}")
        write_documents(base, path, format=fmt)
        got = sorted(map(tuple, read_documents(spark, path, format=fmt).collect()))
        assert got == want, f"round-trip mismatch for {fmt}"

    import pytest

    with pytest.raises(ValueError):
        read_documents(spark, "/nope", format="avro")
