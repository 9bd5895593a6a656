"""Product quantization (PQ) — ANN vector compression for corpus scale.

Jegou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search" (IEEE TPAMI 2011, public).  The reference delegates vector
indexing to Milvus, whose index zoo includes IVF_PQ (reference
milvus.py index params); here PQ is expressed as DataFrame
transformations against a broadcast codebook, composing with the
IVF layout in ``operators/ivf.py`` exactly like Milvus composes them.

Why this is THE 100 TB ANN path: a 64-dim float32 embedding is 256
bytes; its PQ code at M=4 subvectors x K=16 codes is 4 small ints —
a ~64x compression, which is the difference between "the candidate
scan reads the raw vector corpus" and "the candidate scan reads a
code table 1/64th the size".  Query-time scoring never touches raw
vectors: an M x K lookup table of exact integer distances per query
(the ADC — asymmetric distance computation — table) is broadcast as
one literal, and each corpus row's score is M array lookups summed,
row-local in whole-stage codegen.  The only shuffle in a PQ top-k is
the per-query window over the k-bounded candidate set.

Determinism discipline (FIXTURES.md §3, the SemDeDup k-means recipe
from queries/curation.py applied per subvector): components quantized
to round(x*1000) integers, codebooks seeded from the K lowest vec_ids,
floor-average centroid updates, argmin ties broken toward the lowest
code id — every distance, codeword, and ADC score is integer-exact in
both Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_graph_rag_spark.functions.literals import inline_rows, int_array_lit

# Geometry mirrors the embeddings table (dim 64) and the k-means query's
# scale discipline; a deployment tunes M/K at index-build time.
PQ_DIM = 64
PQ_M = 4  # subvectors
PQ_SUB = PQ_DIM // PQ_M  # dims per subvector
PQ_K = 16  # codes per subvector codebook
PQ_SCALE = 1000

# Codebook type: per subvector m, a sorted list of (code_id, codeword)
# where codeword is a PQ_SUB-long list of quantized ints.  A code that
# loses all members during a Lloyd update simply disappears (same rule
# as queries/curation._train_centroids).
Codebooks = list[list[tuple[int, list[int]]]]


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, qv array<long>[, *keep]) — the integer-exact vector surface
    every PQ step operates on (round(x*1000) after an exact float->double
    widen).  ``keep`` carries extra columns through unchanged (the
    single-pass index writers thread ``cell_id`` along instead of
    re-deriving it and joining — guide §2.4)."""
    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            vec_col, lambda x: F.round(x.cast("double") * PQ_SCALE).cast("long")
        ).alias("qv"),
        *[F.col(c) for c in keep],
    )


def _codebook_literals(codebooks: Codebooks):
    """One nested array literal per side: CMAT[m] = list of codewords,
    CIDS[m] = the matching code ids (positions align).  Each side is a
    SINGLE ``lit`` node (not a CreateArray tree of M*K*SUB leaves) — the
    analyzer/optimizer walk the codebook as one constant, the stricter
    form of the _km_assign expression-size rule."""
    cmat = int_array_lit(
        [[list(vec) for _, vec in book] for book in codebooks],
        "array<array<array<bigint>>>",
    )
    cids = int_array_lit(
        [[cid for cid, _ in book] for book in codebooks], "array<array<int>>"
    )
    return cmat, cids


def encode_pq(
    q: DataFrame, codebooks: Codebooks, keep: tuple[str, ...] = ()
) -> DataFrame:
    """(vec_id, qv, codes array<int>[, *keep]) — codes[m] = argmin-L2^2
    code id of subvector m against codebook m, ties to the lowest code id.

    Row-local against the broadcast codebook literal: per subvector the
    distance vector is computed once and let-bound (``transform(array(d),
    ...)[0]``, the l2_normalize binding), and the subvector slice is a
    lambda-bound ``slice(qv, m*SUB+1, SUB)`` — no explode, no shuffle;
    the whole encoding inlines into one codegen stage.
    """
    cmat, cids = _codebook_literals(codebooks)
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda m: F.transform(
            F.array(
                F.transform(
                    F.element_at(cmat, m + 1),
                    lambda c: F.aggregate(
                        F.zip_with(
                            F.slice(F.col("qv"), m * PQ_SUB + 1, PQ_SUB),
                            c,
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    ),
                )
            ),
            lambda d: F.element_at(
                F.element_at(cids, m + 1),
                F.array_position(d, F.array_min(d)).cast("int"),
            ),
        )[0],
    )
    return q.select(
        "vec_id", "qv", codes.alias("codes"), *[F.col(c) for c in keep]
    )


def encode_pq_np(
    q: DataFrame,
    codebooks: Codebooks,
    passthrough: tuple[str, ...] = (),
    emit_qv: bool = True,
) -> DataFrame:
    """Numpy twin of :func:`encode_pq` (Arrow-batched ``mapInPandas``, the
    sanctioned pandas scale path) — BIT-EXACT by construction: quantized
    components are |x| <= PQ_SCALE, so every int64 product (<= 10^6·SUB)
    and squared subvector distance stays an exact integer, identical to
    the JVM fold's bigints; ``np.argmin``'s first-minimum equals the
    lowest-code-id tie rule because each codebook's entries are ordered by
    code id (the same order the literal form walks).  Pinned by
    tests/test_pq.py::test_encode_pq_np_bitexact_vs_hof.

    Used by the streaming ingest path (vector_index.append_to_index),
    where per-batch encoding is the dominant 100x-smoke cost (n·M·K·SUB
    interpreted ops in the HOF form); the one-shot registered queries keep
    the JVM form their plans pin.

    ``passthrough`` columns ride the Arrow batches unchanged (the
    single-pass index writer threads ``cell_id`` through instead of
    joining a second derivation of the batch — guide §2.4); ``emit_qv=
    False`` drops the quantized vectors from the RETURN batches when the
    caller only needs codes, halving the Python->JVM Arrow bytes
    (guide §4.1: control how many columns cross the boundary)."""
    import numpy as np
    import pandas as pd

    ids = [np.asarray([cid for cid, _ in book], dtype=np.int64) for book in codebooks]
    mats = [
        np.asarray([list(vec) for _, vec in book], dtype=np.int64)
        for book in codebooks
    ]

    def _enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray(pdf["qv"].tolist(), dtype=np.int64)
            codes = np.empty((len(V), PQ_M), dtype=np.int64)
            for m in range(PQ_M):
                sub = V[:, m * PQ_SUB : (m + 1) * PQ_SUB]
                C = mats[m]
                D = (
                    np.einsum("ij,ij->i", sub, sub)[:, None]
                    - 2 * (sub @ C.T)
                    + np.einsum("ij,ij->i", C, C)[None, :]
                )
                codes[:, m] = ids[m][np.argmin(D, axis=1)]
            out = {"vec_id": pdf["vec_id"]}
            if emit_qv:
                out["qv"] = pdf["qv"]
            out["codes"] = [[int(c) for c in row] for row in codes]
            for c in passthrough:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    schema_parts = ["vec_id long"]
    if emit_qv:
        schema_parts.append("qv array<bigint>")
    schema_parts.append("codes array<int>")
    for c in passthrough:
        schema_parts.append(f"{c} {q.schema[c].dataType.simpleString()}")
    return q.select("vec_id", "qv", *passthrough).mapInPandas(
        _enc, ", ".join(schema_parts)
    )


def train_pq_codebooks(q: DataFrame, updates: int = 1) -> Codebooks:
    """Per-subvector Lloyd training, all M codebooks in each single pass.

    Seeds: the K lowest vec_ids' subvectors (codebook m's seed c is seed
    vector c's m-th slice).  Each update encodes the corpus row-locally
    against the current codebooks (one scan, no shuffle), then floor-
    averages per (m, code, sub-dim) — a map-side-combined aggregation
    whose result is the M*K*SUB codebook cell grid, the only driver-side
    state (1024 ints at the defaults, the k-means centroid contract).
    """
    seeds = q.orderBy("vec_id").limit(PQ_K).collect()
    codebooks: Codebooks = [
        [
            (i, list(r["qv"])[m * PQ_SUB : (m + 1) * PQ_SUB])
            for i, r in enumerate(seeds)
        ]
        for m in range(PQ_M)
    ]
    if not seeds:
        return [[] for _ in range(PQ_M)]
    for _ in range(updates):
        enc = encode_pq(q, codebooks)
        # The (m, code, spos, x) cell rows are built INSIDE one row-local
        # expression that let-binds the codes array (``transform(array(
        # codes), cs -> ...)[0]``) before the explode: a plain
        # ``posexplode(qv)`` + ``element_at(codes, ...)`` projection would
        # be projection-collapsed into the explode's output and re-run the
        # full M*K argmin encoding once PER EXPLODED DIM (64x per vector).
        cell_rows = F.transform(
            F.array(F.col("codes")),
            lambda cs: F.transform(
                F.sequence(F.lit(0), F.lit(PQ_DIM - 1)),
                lambda pos: F.struct(
                    (pos / PQ_SUB).cast("int").alias("m"),
                    (pos % PQ_SUB).cast("int").alias("spos"),
                    F.element_at(cs, (pos / PQ_SUB).cast("int") + 1).alias(
                        "code"
                    ),
                    F.element_at(F.col("qv"), pos + 1).alias("x"),
                ),
            ),
        )[0]
        cells = (
            enc.select(F.explode(cell_rows).alias("c"))
            .select("c.m", "c.code", "c.spos", "c.x")
            .groupBy("m", "code", "spos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_books: list[dict[int, list[int]]] = [dict() for _ in range(PQ_M)]
        for r in cells:
            vec = new_books[int(r["m"])].setdefault(int(r["code"]), [0] * PQ_SUB)
            # exact floor division == the oracle's floor of an exact double
            # quotient (integer quotients stay far from the boundary)
            vec[int(r["spos"])] = int(r["s"]) // int(r["n"])
        codebooks = [sorted(book.items()) for book in new_books]
        codebooks = [[(cid, vec) for cid, vec in book] for book in codebooks]
    return codebooks


def adc_tables(query_vectors: list[tuple[int, list[int]]], codebooks: Codebooks):
    """Per query: T[m][j] = L2^2(query subvector m, codebook m's j-th
    codeword) — exact integers, computed driver-side from the (bounded)
    collected codebooks.  Returns [(query_id, table), ...] with table
    positions aligned to the codebook literal positions."""
    out = []
    for qid, qv in query_vectors:
        tab = []
        for m, book in enumerate(codebooks):
            sub = qv[m * PQ_SUB : (m + 1) * PQ_SUB]
            tab.append(
                [
                    sum((a - b) * (a - b) for a, b in zip(sub, vec))
                    for _, vec in book
                ]
            )
        out.append((qid, tab))
    return out


def adc_score(
    query_vectors: list[tuple[int, list[int]]],
    codebooks: Codebooks,
    query_id_col: str = "query_id",
    codes_col: str = "codes",
):
    """ADC distance as a Column over rows carrying (query_id, codes) —
    the per-candidate scoring form used when a candidate generator (IVF
    probe pruning, an LSH bucket join) has already paired queries with
    code-table rows.  Same integer tables as :func:`adc_topk`; the row's
    query_id picks its table via one array_position against the query-id
    literal."""
    tabs = adc_tables(query_vectors, codebooks)
    qids = int_array_lit([qid for qid, _ in tabs], "array<bigint>")
    qtab = int_array_lit(
        [tab for _, tab in tabs], "array<array<array<bigint>>>"
    )
    id_to_pos = int_array_lit(
        [[cid for cid, _ in book] for book in codebooks], "array<array<int>>"
    )
    t = F.element_at(
        qtab, F.array_position(qids, F.col(query_id_col)).cast("int")
    )
    return F.aggregate(
        F.zip_with(
            F.col(codes_col),
            F.sequence(F.lit(0), F.lit(PQ_M - 1)),
            lambda code, m: F.element_at(
                F.element_at(t, m + 1),
                F.array_position(
                    F.element_at(id_to_pos, m + 1), code
                ).cast("int"),
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def adc_topk(
    enc: DataFrame,
    query_vectors: list[tuple[int, list[int]]],
    codebooks: Codebooks,
    k: int = 10,
) -> DataFrame:
    """(query_id, vec_id, adc_dist, rank) — rank 1..k per query by
    ascending asymmetric distance, ties to the lowest vec_id.

    The scan is ONE pass over the code table: all queries' ADC tables ride
    a single nested literal, each row computes every query's score as M
    array lookups (sum via ``aggregate`` over the code array positions),
    and ``posexplode`` fans out (row x query) AFTER scoring — so the
    corpus is read once regardless of query-batch size.  The only shuffle
    is the per-query top-k window, candidate-bounded exactly like
    operators/topk.cosine_topk.

    ``enc`` should be a MATERIALIZED code table (a stored parquet index,
    or at least a checkpointed frame) — the deployment model anyway, since
    the whole point of PQ is to write the 1/64th-size code table once.
    Feeding the raw ``encode_pq`` plan in directly also works but plans
    worse: ``InferFiltersFromGenerate`` infers ``size/isnotnull`` filters
    from the explode and pushes the full encoding expression into them,
    tripling the per-row argmin work.
    """
    tabs = adc_tables(query_vectors, codebooks)
    qids = int_array_lit([qid for qid, _ in tabs], "array<bigint>")
    # QTAB[q][m][j]: integer ADC lookup tables for the whole query batch —
    # one literal node, like the codebooks
    qtab = int_array_lit(
        [tab for _, tab in tabs], "array<array<array<bigint>>>"
    )
    # positions of each code id within its codebook literal (code ids are
    # not necessarily dense after an update drops empty codes)
    id_to_pos = int_array_lit(
        [[cid for cid, _ in book] for book in codebooks], "array<array<int>>"
    )
    # codes is let-bound once per row: referencing F.col("codes") directly
    # inside the per-query lambda would let projection collapse re-inline
    # the full argmin encoding once per query
    scores = F.transform(
        F.array(F.col("codes")),
        lambda cs: F.transform(
            qtab,
            lambda t: F.aggregate(
                F.zip_with(
                    cs,
                    F.sequence(F.lit(0), F.lit(PQ_M - 1)),
                    lambda code, m: F.element_at(
                        F.element_at(t, m + 1),
                        F.array_position(
                            F.element_at(id_to_pos, m + 1), code
                        ).cast("int"),
                    ),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        ),
    )[0]
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    return (
        enc.select("vec_id", scores.alias("__s"))
        .select("vec_id", F.posexplode("__s").alias("__qi", "adc_dist"))
        .select(
            F.element_at(qids, F.col("__qi") + 1).alias("query_id"),
            "vec_id",
            "adc_dist",
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --- stored IVF-PQ index (codes partitioned by coarse cell) -------------------


def write_ivfpq_index(
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks: Codebooks,
    path: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> None:
    """Materialize the IVF-PQ index: PQ CODES (not vectors) written
    ``partitionBy(cell_id)``.  This is the layout that makes billion-scale
    ANN cheap — a probe reads nprobe cells' code files, which are ~1/64th
    the bytes of the raw vectors AND partition-pruned, so the scan cost is
    O(corpus/nlist · nprobe / 64) of the brute-force read."""
    from vector_graph_rag_spark.operators.ivf import assign_cells

    # SINGLE PASS (guide §2.4): cell assignment and PQ encoding are both
    # row-local expressions against broadcast literals, so they compose in
    # one projection over one corpus scan — the former two-derivation form
    # (assign one side, encode the other, equi-join on vec_id) scanned the
    # corpus twice and paid a corpus-sized join exchange purely to re-unite
    # columns it had itself split apart.  Row content is identical: both
    # expressions are per-row functions of the same vector.
    assigned = assign_cells(
        corpus.select(corpus_id, corpus_vec).filter(
            F.col(corpus_vec).isNotNull()
        ),
        centroids,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
    )
    q = quantize_embeddings(
        assigned, id_col=corpus_id, vec_col=corpus_vec, keep=("cell_id",)
    )
    enc = encode_pq(q, codebooks, keep=("cell_id",)).select(
        "vec_id", "codes", "cell_id"
    )
    # Salted repartition BEFORE partitionBy: a task-local write fans out to
    # (upstream tasks x cells) files — at 1000 executors x 10k cells that's
    # a file-count explosion whose listing cost lands on every probe.
    # Hashing (cell_id, salt) bounds files-per-cell at the salt modulus
    # (skew-safe: a hot cell still splits across 4 writers) for one shuffle
    # of the CODE table — 1/64th-scale bytes, the cheap side.
    (
        enc.repartition(F.col("cell_id"), F.pmod(F.hash("vec_id"), F.lit(4)))
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(path)
    )


def ivfpq_search(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: Codebooks,
    k: int = 10,
    nprobe: int = 2,
    query_id: str = "query_id",
    query_vec: str = "qvec",
) -> DataFrame:
    """(query_id, vec_id, adc_dist, rank) over ONLY the probed cells' code
    files.  Probe cells collect to a literal IN-list (|queries| x nprobe,
    bounded) so the index scan carries PartitionFilters; scoring is the
    row-local :func:`adc_score` against the query batch's integer tables —
    raw vectors are never read at query time."""
    from pyspark.sql import Window

    from vector_graph_rag_spark.functions.vector import cosine

    w_probe = Window.partitionBy("vec_id").orderBy(
        F.desc("__cs"), F.asc("centroid_id")
    )
    # Probes MUST be derived from the same query set adc_score will see:
    # quantize_embeddings drops NULL-embedding queries, but a NULL row in
    # the raw frame would still earn nprobe probe rows (row_number orders
    # null cosines), and adc_score's array_position(qids, query_id) = 0
    # would then raise ELEMENT_AT_BY_INDEX_ZERO at execution — one bad
    # query failing the whole search job (ADVICE r9).  quantize_embeddings
    # applies that filter here.  ONE bounded collect (|queries| x nprobe
    # rows) carries both the probe pairs and the quantized query vectors —
    # the former two-collect form launched two driver jobs per search for
    # the same tiny data (guide §5).
    probed = (
        quantize_embeddings(
            queries, id_col=query_id, vec_col=query_vec, keep=(query_vec,)
        )
        .crossJoin(F.broadcast(centroids))
        .withColumn("__cs", F.round(cosine(query_vec, "cvec"), 6))
        .withColumn("__rk", F.row_number().over(w_probe))
        .filter(F.col("__rk") <= nprobe)
        .select("vec_id", "centroid_id", "qv")
        .collect()
    )
    if not probed:
        # non-empty queries against an EMPTY centroid table: the one-pass
        # collect yields no probe rows AND no query vectors, and adc_score
        # over empty literal arrays fails analysis — the two-collect r16
        # form returned the empty result instead (ADVICE r17)
        return spark.createDataFrame(
            [], f"{query_id} long, vec_id long, adc_dist long, rank int"
        )
    probed.sort(key=lambda r: (r["vec_id"], r["centroid_id"]))
    probe_rows = [
        {query_id: r["vec_id"], "centroid_id": r["centroid_id"]} for r in probed
    ]
    cells = sorted({r["centroid_id"] for r in probed})
    seen: dict[int, list[int]] = {}
    for r in probed:
        seen.setdefault(int(r["vec_id"]), list(r["qv"]))
    qvecs = sorted(seen.items())
    index = spark.read.parquet(index_path).filter(F.col("cell_id").isin(cells))
    pairs = inline_rows(
        spark,
        [(r[query_id], r["centroid_id"]) for r in probe_rows],
        f"{query_id} bigint, cell_id bigint",
    )
    w_rank = Window.partitionBy(query_id).orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    return (
        index.join(F.broadcast(pairs), "cell_id")
        .withColumn(
            "adc_dist", adc_score(qvecs, codebooks, query_id_col=query_id)
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(query_id, "vec_id", "adc_dist", "rank")
    )
