"""Count-Min + heavy-hitter registers — sharding invariance, replay
idempotence, DuckDB twin exactness, the Misra-Gries candidate guarantee,
and the lower/upper bound contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_graph_rag_spark.sources.tables import load_table
from vector_graph_rag_spark.streaming.freq_sketch import (
    CM_WIDTH,
    cm_estimate,
    corpus_heavy_hitters,
    write_batch_freq,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "source")


def test_cm_counters_sharding_invariant_and_replay_idempotent(spark, tmp_path):
    docs = _docs(spark)
    tables = []
    for mod in (2, 5):
        state = str(tmp_path / f"f{mod}")
        for b in range(mod):
            write_batch_freq(
                docs.filter(F.col("doc_id") % mod == b), state, b, ["source"]
            )
        merged = {
            (r["row"], r["pos"]): r["cnt"]
            for r in spark.read.parquet(state)
            .filter(F.col("kind") == "cm")
            .groupBy("row", "pos")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        }
        tables.append(merged)
    assert tables[0] == tables[1]
    state = str(tmp_path / "f2")
    write_batch_freq(docs.filter(F.col("doc_id") % 2 == 1), state, 1, ["source"])
    replay = {
        (r["row"], r["pos"]): r["cnt"]
        for r in spark.read.parquet(state)
        .filter(F.col("kind") == "cm")
        .groupBy("row", "pos")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert replay == tables[0]


def test_cm_counters_match_duckdb_twin_exactly(spark):
    """The counter table is md5-derived universal-hash arithmetic — DuckDB
    reproduces every (row, pos, cnt) exactly (the registry-swap oracle
    path)."""
    import duckdb

    from vector_graph_rag_spark.functions.hashing import (
        _A_PARAMS,
        _B_PARAMS,
        MERSENNE_P,
    )
    from vector_graph_rag_spark.streaming.freq_sketch import CM_DEPTH, _cm_counts

    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS row, ({_A_PARAMS[i]} * h + {_B_PARAMS[i]}) % {MERSENNE_P} % {CM_WIDTH} AS pos FROM h"
        for i in range(CM_DEPTH)
    )
    duck = {
        (r, p): c
        for r, p, c in duckdb.connect()
        .execute(
            f"""
            WITH v AS (SELECT 'src' || CAST(range % 37 AS VARCHAR) AS s FROM range(0, 2000)),
            h AS (SELECT CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {MERSENNE_P} AS h FROM v),
            pos AS ({union})
            SELECT row, pos, COUNT(*) FROM pos GROUP BY 1, 2
            """
        )
        .fetchall()
    }
    df = spark.range(2000).select(
        F.concat(F.lit("src"), (F.col("id") % 37).cast("string")).alias("s")
    )
    got = {(r["row"], r["pos"]): r["cnt"] for r in _cm_counts(df, "s").collect()}
    assert got == duck


def test_misra_gries_guarantee_survives_adversarial_sharding(spark, tmp_path):
    """A value with global count > N/m must surface as a candidate no
    matter how the corpus is sharded (pigeonhole: it exceeds rows/m in at
    least one shard) — spread the heavy value as thin as possible and it
    still must appear."""
    heavy = [("HEAVY",)] * 200
    light = [(f"v{i}",) for i in range(800)]
    rows = []
    for i in range(10):  # interleave: each shard gets 20 heavy + 80 light
        rows += heavy[i * 20 : (i + 1) * 20] + light[i * 80 : (i + 1) * 80]
    df = spark.createDataFrame(
        [(v, i % 10) for i, (v,) in enumerate(rows)], "value string, shard long"
    )
    state = str(tmp_path / "f")
    for b in range(10):
        write_batch_freq(df.filter(F.col("shard") == b), state, b, ["value"])
    hh = {r["value"]: r for r in corpus_heavy_hitters(spark, state).collect()}
    assert "HEAVY" in hh
    r = hh["HEAVY"]
    assert r["cnt_lower"] <= 200 <= r["cm_upper"]


def test_cm_estimate_upper_bounds_truth(spark, tmp_path):
    docs = _docs(spark)
    state = str(tmp_path / "f")
    write_batch_freq(docs, state, 0, ["source"])
    truth = {
        r["source"]: r["cnt"]
        for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    ests = cm_estimate(spark, state, "source", list(truth))
    for v, t in truth.items():
        assert ests[v] >= t, (v, ests[v], t)
        assert ests[v] <= t + 3 * (len(truth) * 25) // CM_WIDTH + 5  # loose eps*N


def test_plan_is_jvm_only(spark):
    from vector_graph_rag_spark.streaming.freq_sketch import _cm_counts

    docs = _docs(spark)
    plan = _cm_counts(docs, "source")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
