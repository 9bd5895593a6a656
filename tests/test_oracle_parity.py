"""Every declared query must match its DuckDB oracle (driver's t2 gate)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _query_names():
    from vector_graph_rag_spark.queries import load_all

    # include_retired: rotated-out queries keep their local oracle gate
    return sorted(load_all(include_retired=True).keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, name):
    from vector_graph_rag_spark.testing import compare_query

    res = compare_query(spark, name, SF_SMOKE)
    assert res["status"] in ("ok", "rows_only"), res
    if res["status"] == "ok":
        assert res["rows"] >= 0
