#!/usr/bin/env python
"""Stored IVF-PQ layout scale smoke (r9 verdict, Next #6).

Measures the PERSISTENT half of the IVF-PQ story (`write_ivfpq_index` /
`ivfpq_search`, operators/pq.py) at 1x/10x/100x the sf0.1 embeddings
corpus, holding CELL SIZE constant the way a real deployment does (nlist
grows with the corpus — the Milvus sqrt(N)-ish rule), so the claim under
test is the billion-scale one:

    probe cost is flat in corpus size — a query reads nprobe cells' CODE
    files (PartitionFilters), never the corpus.

Copy semantics: copy i re-keys vec_id into a disjoint range and ROTATES
each embedding by 7*i positions.  Rotation preserves norms and all
within-copy cosine structure (cos(rot(v), rot(u)) = cos(v, u)), so every
copy is a structurally-identical shard of vector space pointing in fresh
directions; with 8 centroids drawn per copy (the copy's own lowest
vec_ids, rotated with it), each copy's rows overwhelmingly assign to its
own centroids and per-cell occupancy stays ~constant while nlist grows
8 -> 80 -> 800.  Codebooks are trained ONCE on the 1x corpus and reused —
the standard PQ deployment (train on a sample, encode everything), which
also keeps the ADC tables byte-identical across scales.

Reported per scale: index build wall (the pay-once linear term), index
bytes on disk vs raw-vector bytes (the ~1/64 compression claim at real
dims; at dim=64/M=4 fixture shape the code table is dominated by ids,
so bytes-per-row is the honest column), probe wall + probed candidate
rows (the flat claims), and the PartitionFilters assertion on the probe
plan.

Usage: python tools/ivfpq_stored_smoke.py [--out /tmp/ivfpq_smoke] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
DOC_STRIDE = 1_000_000
CENT_PER_COPY = 8
NPROBE = 2
K = 10


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def build_scaled(spark, out_path: str, copies: int):
    """Scaled embeddings with rotated copies; returns (corpus_df, centroids_df)."""
    from pyspark.sql import functions as F

    from vector_graph_rag_spark.sources.tables import load_table

    emb = load_table(spark, SF01, "embeddings").select("vec_id", "embedding")
    dim = 64
    parts = [emb]
    for i in range(1, copies):
        # (7*i) % dim cycles with period dim (gcd(7,64)=1), so copies
        # i >= dim would be exact directional DUPLICATES of copies i-dim —
        # their centroids would tie bit-exactly with the older copy's and
        # assign_cells' lowest-id tie-break would pile both copies into one
        # cell (2x occupancy, 1 empty cell), distorting the flat-probe
        # measurement.  Negating the second rotation cycle keeps all
        # 2*dim=128 transforms direction-distinct (covers copies <= 128).
        r = (7 * i) % dim
        rotated = F.concat(
            F.slice("embedding", r + 1, dim - r), F.slice("embedding", 1, r)
        )
        if (i // dim) % 2 == 1:
            rotated = F.transform(rotated, lambda x: -x)
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * DOC_STRIDE)).alias("vec_id"),
                rotated.alias("embedding"),
            )
        )
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    scaled.repartition(32).write.mode("overwrite").parquet(out_path)
    corpus = spark.read.parquet(out_path)
    cent = corpus.filter(
        F.col("vec_id") % DOC_STRIDE < CENT_PER_COPY
    ).select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec"))
    return corpus, cent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ivfpq_smoke")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--scales", default="1,10,100")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from vector_graph_rag_spark.operators.pq import (
        ivfpq_search,
        quantize_embeddings,
        train_pq_codebooks,
        write_ivfpq_index,
    )
    from vector_graph_rag_spark.session import get_spark
    from vector_graph_rag_spark.sources.tables import load_table

    spark = get_spark(app_name="ivfpq_stored_smoke")
    spark.sparkContext.setLogLevel("ERROR")

    # Codebooks: trained once on the 1x corpus (sample-train, encode-all).
    base = load_table(spark, SF01, "embeddings").select("vec_id", "embedding")
    books = train_pq_codebooks(quantize_embeddings(base), updates=1)

    queries = base.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 105)
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    queries = queries.localCheckpoint(eager=True)  # pin: identical across scales

    results = {}
    for scale in [int(s) for s in args.scales.split(",")]:
        data_path = os.path.join(args.out, f"emb_{scale}x")
        index_path = os.path.join(args.out, f"index_{scale}x")
        corpus, cent = build_scaled(spark, data_path, copies=scale)
        n = corpus.count()
        cent = cent.localCheckpoint(eager=True)

        t0 = time.perf_counter()
        write_ivfpq_index(corpus, cent, books, index_path)
        build_s = round(time.perf_counter() - t0, 3)

        raw_bytes = _dir_bytes(data_path)
        idx_bytes = _dir_bytes(index_path)

        probe_runs, cand_rows = [], 0
        plan_ok = False
        for _ in range(args.iters):
            t0 = time.perf_counter()
            res = ivfpq_search(
                spark, index_path, queries, cent, books, k=K, nprobe=NPROBE
            )
            rows = res.collect()
            probe_runs.append(round(time.perf_counter() - t0, 3))
            plan = res._jdf.queryExecution().executedPlan().toString()
            plan_ok = bool(
                re.search(r"PartitionFilters: \[[^\]]*cell_id[^\]]*IN", plan)
            )
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
        # candidate volume actually scanned: rows in the probed cells
        # (re-derive the probe set the same way the search does)
        from vector_graph_rag_spark.functions.vector import cosine
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.desc("__cs"), F.asc("centroid_id")
        )
        cells = sorted(
            {
                r["centroid_id"]
                for r in queries.crossJoin(F.broadcast(cent))
                .withColumn("__cs", F.round(cosine("qvec", "cvec"), 6))
                .withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk") <= NPROBE)
                .select("centroid_id")
                .collect()
            }
        )
        cand_rows = (
            spark.read.parquet(index_path)
            .filter(F.col("cell_id").isin(cells))
            .count()
        )
        results[f"{scale}x"] = {
            "corpus_rows": n,
            "nlist": scale * CENT_PER_COPY,
            "build_sec": build_s,
            "raw_bytes": raw_bytes,
            "index_bytes": idx_bytes,
            "probe_runs": probe_runs,
            "probe_warm_min": min(probe_runs[1:]) if len(probe_runs) > 1 else probe_runs[0],
            "probed_cells": len(cells),
            "candidate_rows": cand_rows,
            "result_rows": len(rows),
            "partition_filters": plan_ok,
        }
        print(f"# {scale}x: {json.dumps(results[f'{scale}x'])}", file=sys.stderr)
        shutil.rmtree(data_path, ignore_errors=True)
        shutil.rmtree(index_path, ignore_errors=True)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
