#!/usr/bin/env python
"""Shuffle-volume audit: measured shuffle bytes per heavy query.

Plan reading says WHERE the shuffles are; this measures HOW BIG they are —
the number that actually decides 100 TB viability. For each audited query,
runs the action twice (the second run's delta excludes one-time work) and
snapshots the Spark UI REST API stage metrics around it, reporting summed
shuffle write/read bytes and records.

Usage: python tools/shuffle_audit.py [--sf /root/testdata/sf0.1]
       [--queries name,name,...]
Prints one JSON line {query: {shuffle_write_bytes, shuffle_read_bytes,
shuffle_write_records, sec}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "subgraph_expand_d1",
    "entity_ppr_seeds_k8",
    "contamination_ngram_overlap",
    "sequence_packing",
    "kmeans_embedding_clusters",
    "bm25_keyword_topk",
    "dedup_exact",
    "graph_rag_full_query",
    # round-7 registered pipeline operators (audited at 2-3 scales in
    # SCALE.md §shuffle-volume; kept in the default set for continuity)
    "bpe_train_merges",
    "bloom_membership_profile",
    # round-8 registered pipeline operators
    "corpus_stats_registers",
    "fixed_block_packing",
    "expectations_validate",
]


def _stage_totals(ui: str, app_id: str) -> dict[str, int]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    tot = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0, "shuffle_write_records": 0}
    for s in stages:
        tot["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
        tot["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
        tot["shuffle_write_records"] += s.get("shuffleWriteRecords", 0)
    return tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()
    names = args.queries.split(",") if args.queries else DEFAULT_QUERIES

    from vector_graph_rag_spark.queries import load_all
    from vector_graph_rag_spark.queries.graphrag import _graph
    from vector_graph_rag_spark.session import get_spark

    spark = get_spark(
        app_name="shuffle_audit", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = f"http://localhost:{spark.conf.get('spark.ui.port', '4040')}"
    app_id = spark.sparkContext.applicationId
    registry = load_all(include_retired=True)
    _graph(spark, args.sf)  # one-time graph materialization outside the audit

    report: dict[str, dict] = {}
    for name in names:
        fn = registry[name].fn
        fn(spark, args.sf).count()  # warm run: codegen + any one-time work
        before = _stage_totals(ui, app_id)
        t0 = time.perf_counter()
        fn(spark, args.sf).count()
        sec = round(time.perf_counter() - t0, 3)
        after = _stage_totals(ui, app_id)
        report[name] = {k: after[k] - before[k] for k in before}
        report[name]["sec"] = sec
        print(f"# {name}: {report[name]}", file=sys.stderr)

    print(json.dumps({"sf": args.sf, "queries": report}))
    spark.stop()


if __name__ == "__main__":
    main()
