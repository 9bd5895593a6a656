"""Product-quantization kernels (operators/pq.py) vs an independent
pure-Python twin — seeds, floor-avg Lloyd update, row-local encoding,
ADC tables, and the ascending-distance top-k.

The staged query `ann_pq_adc_topk` is additionally hash-gated against
its straight-line DuckDB oracle by tests/test_oracle_parity.py; these
tests pin the kernels on corpora the parquet fixtures can't express
(empty input, dropped codes, tie-breaks) and the compression contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_graph_rag_spark.operators.pq import (
    PQ_DIM,
    PQ_K,
    PQ_M,
    PQ_SUB,
    adc_tables,
    adc_topk,
    encode_pq,
    quantize_embeddings,
    train_pq_codebooks,
)


# --- pure-Python twin ---------------------------------------------------------


def _twin_sub(v, m):
    return v[m * PQ_SUB : (m + 1) * PQ_SUB]


def _twin_d2(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _twin_encode(vecs, codebooks):
    """{vec_id: [code per m]} — argmin L2^2, ties to the lowest code id."""
    out = {}
    for vid, v in vecs:
        codes = []
        for m in range(PQ_M):
            best = min(
                (( _twin_d2(_twin_sub(v, m), vec), cid) for cid, vec in codebooks[m]),
            )
            codes.append(best[1])
        out[vid] = codes
    return out


def _twin_train(vecs, updates=1):
    seeds = sorted(vecs)[:PQ_K]
    books = [
        [(i, _twin_sub(v, m)) for i, (_, v) in enumerate(seeds)]
        for m in range(PQ_M)
    ]
    for _ in range(updates):
        enc = _twin_encode(vecs, books)
        cells = {}
        for vid, v in vecs:
            for m in range(PQ_M):
                key = (m, enc[vid][m])
                s, n = cells.get(key, ([0] * PQ_SUB, 0))
                s = [a + b for a, b in zip(s, _twin_sub(v, m))]
                cells[key] = (s, n + 1)
        books = [
            sorted(
                (cid, [x // n for x in s])
                for (m2, cid), (s, n) in cells.items()
                if m2 == m
            )
            for m in range(PQ_M)
        ]
    return books


def _mk_vecs(n, seed=7):
    """Deterministic synthetic integer 'quantized' vectors."""
    vecs = []
    x = seed
    for i in range(n):
        v = []
        for _ in range(PQ_DIM):
            x = (x * 1103515245 + 12345) % (2**31)
            v.append(x % 2001 - 1000)
        vecs.append((i, v))
    return vecs


def _spark_q(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) / 1000.0 for x in v]) for i, v in vecs],
        "vec_id long, embedding array<double>",
    )


# --- tests --------------------------------------------------------------------


def test_quantize_round_trips_integer_grid(spark):
    vecs = _mk_vecs(5)
    q = quantize_embeddings(_spark_q(spark, vecs))
    got = {r["vec_id"]: list(r["qv"]) for r in q.collect()}
    assert got == dict(vecs)


def test_train_and_encode_match_python_twin(spark):
    vecs = _mk_vecs(60)
    q = quantize_embeddings(_spark_q(spark, vecs))
    books = train_pq_codebooks(q, updates=1)
    twin_books = _twin_train(vecs, updates=1)
    assert books == twin_books
    enc = {
        r["vec_id"]: list(r["codes"])
        for r in encode_pq(q, books).collect()
    }
    assert enc == _twin_encode(vecs, twin_books)


def test_encoding_is_partitioning_invariant(spark):
    vecs = _mk_vecs(40)
    q = quantize_embeddings(_spark_q(spark, vecs))
    books = train_pq_codebooks(q, updates=1)
    a = sorted(map(tuple, encode_pq(q, books).select("vec_id", "codes").collect()))
    b = sorted(
        map(
            tuple,
            encode_pq(q.repartition(7), books).select("vec_id", "codes").collect(),
        )
    )
    assert [(v, list(c)) for v, c in a] == [(v, list(c)) for v, c in b]


def test_adc_topk_matches_twin_bruteforce(spark):
    vecs = _mk_vecs(60)
    q = quantize_embeddings(_spark_q(spark, vecs))
    books = train_pq_codebooks(q, updates=1)
    enc = _twin_encode(vecs, books)
    queries = [(i, v) for i, v in vecs[:3]]
    tabs = dict(adc_tables(queries, books))
    # twin: score every corpus vector from the tables, rank asc, ties by id
    expect = set()
    for qid, _ in queries:
        scored = []
        for vid, _v in vecs:
            pos = {m: {cid: j for j, (cid, _) in enumerate(books[m])} for m in range(PQ_M)}
            s = sum(tabs[qid][m][pos[m][enc[vid][m]]] for m in range(PQ_M))
            scored.append((s, vid))
        for rk, (s, vid) in enumerate(sorted(scored)[:10], start=1):
            expect.add((qid, vid, s, rk))
    got = {
        (r["query_id"], r["vec_id"], r["adc_dist"], r["rank"])
        for r in adc_topk(encode_pq(q, books), queries, books, k=10).collect()
    }
    assert got == expect


def test_dropped_code_disappears_from_books(spark):
    # two identical seed vectors -> after one update the duplicate code has
    # no members for at least one subvector only if NOTHING assigns to it;
    # force it: 17 vectors where vec 0 and 1 are identical, so code 1 (the
    # duplicate seed) can never win an argmin tie against code 0.
    vecs = _mk_vecs(PQ_K + 1)
    vecs[1] = (1, list(vecs[0][1]))
    q = quantize_embeddings(_spark_q(spark, vecs))
    books = train_pq_codebooks(q, updates=1)
    twin = _twin_train(vecs, updates=1)
    assert books == twin
    for m in range(PQ_M):
        assert 1 not in [cid for cid, _ in books[m]]


def test_empty_corpus_trains_empty_books(spark):
    q = quantize_embeddings(
        spark.createDataFrame([], "vec_id long, embedding array<double>")
    )
    assert train_pq_codebooks(q) == [[] for _ in range(PQ_M)]


def test_code_table_is_m_small_ints(spark):
    # the compression contract: M codes per vector, each a valid code id
    vecs = _mk_vecs(30)
    q = quantize_embeddings(_spark_q(spark, vecs))
    books = train_pq_codebooks(q, updates=1)
    rows = encode_pq(q, books).select("codes").collect()
    valid = [set(cid for cid, _ in books[m]) for m in range(PQ_M)]
    for r in rows:
        assert len(r["codes"]) == PQ_M
        assert all(c in valid[m] for m, c in enumerate(r["codes"]))


def test_pq_plan_is_python_free_and_row_local(spark):
    vecs = _mk_vecs(30)
    q = quantize_embeddings(_spark_q(spark, vecs))
    books = train_pq_codebooks(q, updates=1)
    plan = encode_pq(q, books)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # encoding is row-local: scan -> project


def test_ivfpq_stored_index_matches_inquery_and_prunes(spark, tmp_path):
    """The stored IVF-PQ layout (codes partitionBy(cell_id)) searched via
    partition-pruned scans returns EXACTLY the in-query ann_ivfpq_topk
    rows, and the scan carries a cell_id partition filter."""
    import re

    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from vector_graph_rag_spark.operators.pq import (
        ivfpq_search,
        train_pq_codebooks,
        write_ivfpq_index,
    )
    from vector_graph_rag_spark.queries import load_all
    from vector_graph_rag_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = quantize_embeddings(emb)
    books = train_pq_codebooks(q, updates=1)
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(emb.select("vec_id", "embedding"), cent, books, path)

    queries = emb.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 105)
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    result = ivfpq_search(spark, path, queries, cent, books, k=10, nprobe=2)

    reg = load_all(include_retired=True)
    expected = sorted(map(tuple, reg["ann_ivfpq_topk"].fn(spark, SF_SMOKE).collect()))
    assert sorted(map(tuple, result.collect())) == expected

    plan = result._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*cell_id[^\]]*IN", plan), plan[:800]


def test_ivfpq_search_skips_null_embedding_query(spark, tmp_path):
    """ADVICE r9: a query row with a NULL embedding must be SKIPPED, not
    fail the whole search job — probes derive from the same null-filtered
    query set adc_score sees, so array_position can never return 0."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from vector_graph_rag_spark.operators.pq import (
        ivfpq_search,
        train_pq_codebooks,
        write_ivfpq_index,
    )
    from vector_graph_rag_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = quantize_embeddings(emb)
    books = train_pq_codebooks(q, updates=1)
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(emb.select("vec_id", "embedding"), cent, books, path)

    good = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    bad = spark.createDataFrame(
        [(999999,)], "query_id long"
    ).withColumn("qvec", F.lit(None).cast(good.schema["qvec"].dataType))
    mixed = ivfpq_search(spark, path, good.unionByName(bad), cent, books, k=10, nprobe=2)
    clean = ivfpq_search(spark, path, good, cent, books, k=10, nprobe=2)
    rows = sorted(map(tuple, mixed.collect()))
    assert rows == sorted(map(tuple, clean.collect()))
    assert not any(r[0] == 999999 for r in rows)


def test_ivfpq_search_empty_centroids_returns_empty(spark, tmp_path):
    """ADVICE r17: non-empty queries against an EMPTY centroid table must
    return the empty result frame, not fail analysis — the r17 one-collect
    probe planning derives query vectors from probe rows, of which an
    empty centroid cross join yields none."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from vector_graph_rag_spark.operators.pq import (
        ivfpq_search,
        train_pq_codebooks,
        write_ivfpq_index,
    )
    from vector_graph_rag_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = quantize_embeddings(emb)
    books = train_pq_codebooks(q, updates=1)
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(emb.select("vec_id", "embedding"), cent, books, path)

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    empty_cent = cent.filter(F.lit(False))
    out = ivfpq_search(spark, path, queries, empty_cent, books, k=5, nprobe=2)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "query_id", "vec_id", "adc_dist", "rank",
    ]


def test_ivf_search_skips_null_embedding_query(spark, tmp_path):
    """Same contract for the raw-vector IVF index: a vectorless query is
    skipped instead of surfacing arbitrary rows with NULL scores."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from vector_graph_rag_spark.operators.ivf import ivf_search, write_ivf_index
    from vector_graph_rag_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb.select("vec_id", "embedding"), cent, path)
    good = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    bad = spark.createDataFrame([(999999,)], "query_id long").withColumn(
        "qvec", F.lit(None).cast(good.schema["qvec"].dataType)
    )
    mixed = ivf_search(spark, path, good.unionByName(bad), cent, k=10, nprobe=2)
    clean = ivf_search(spark, path, good, cent, k=10, nprobe=2)
    rows = sorted(map(tuple, mixed.collect()))
    assert rows == sorted(map(tuple, clean.collect()))
    assert not any(r[0] == 999999 for r in rows)


def test_pq_books_cache_fingerprint_invalidates_on_rewrite(tmp_path):
    """The shared-codebook cache keys on (abspath, mtime_ns, size) of the
    embeddings parquet, not the path alone — rewriting a previously-seen
    directory within one process must produce a DIFFERENT key so the three
    PQ-family queries retrain instead of silently serving books trained on
    the old data (r10 ADVICE item 4).  Stat-only, no Spark needed."""
    import os

    from vector_graph_rag_spark.queries.pipeline import _embeddings_fingerprint

    sf = tmp_path / "sf"
    sf.mkdir()
    f = sf / "embeddings.parquet"
    f.write_bytes(b"v1-bytes")
    k1 = _embeddings_fingerprint(str(sf))
    assert k1 == _embeddings_fingerprint(str(sf))  # stable for unchanged bytes

    f.write_bytes(b"v2-bytes-longer")  # size change
    k2 = _embeddings_fingerprint(str(sf))
    assert k2 != k1

    os.utime(f, ns=(1, 1))  # same bytes, mtime change (e.g. overwrite-in-place)
    assert _embeddings_fingerprint(str(sf)) != k2

    # directory-shaped table: adding a part file changes the key
    d = tmp_path / "sfdir"
    d.mkdir()
    part_dir = d / "embeddings.parquet"
    part_dir.mkdir()
    (part_dir / "part-0.parquet").write_bytes(b"p0")
    k3 = _embeddings_fingerprint(str(d))
    (part_dir / "part-1.parquet").write_bytes(b"p1")
    assert _embeddings_fingerprint(str(d)) != k3

    # missing table never raises — distinct sentinel key per path
    assert _embeddings_fingerprint(str(tmp_path / "nope"))[1] is None


def test_encode_pq_np_bitexact_vs_hof(spark):
    """The numpy encode twin (used by the streaming ingest path) must be
    BIT-identical to the JVM HOF form — codes and carried qv both.  A
    duplicate codeword is injected so the first-minimum == lowest-code-id
    tie rule is exercised."""
    from vector_graph_rag_spark.operators.pq import (
        encode_pq,
        encode_pq_np,
        quantize_embeddings,
        train_pq_codebooks,
    )
    from vector_graph_rag_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = quantize_embeddings(emb)
    books = train_pq_codebooks(q, updates=1)
    # duplicate codeword: code 0's vector copied onto the highest code id
    # of each book — every vector nearest code 0 now ties with it, and
    # both engines must resolve to the LOWER id (first minimum)
    forced = [
        [(cid, book[0][1] if cid == book[-1][0] else vec) for cid, vec in book]
        for book in books
    ]
    a = {r["vec_id"]: (list(r["qv"]), list(r["codes"])) for r in encode_pq(q, forced).collect()}
    b = {r["vec_id"]: (list(r["qv"]), list(r["codes"])) for r in encode_pq_np(q, forced).collect()}
    assert a == b
    assert len(a) == q.count()
    # the tie actually fired somewhere and resolved low
    top_ids = {book[-1][0] for book in forced}
    assert not any(set(codes) & top_ids for _qv, codes in a.values())
