#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Usage: python tools/capture_plans.py --tag r17 --suffix before \
           [--queries name,name,...] [--sf /root/testdata/sf0.1]

Writes plans/<tag>/<query>_<suffix>.txt for each query.  EAGER queries
(the *_index_* family, versioned stores) execute their build jobs during
fn(); the captured plan is the returned (probe/result) leg — the part a
standing deployment re-runs per query — which is exactly the plan the
optimization evidence needs alongside the build-path code.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "dedup_index_incremental",
    "ann_index_compacted",
    "ann_index_tombstone_delete",
    "ann_ivfpq_topk",
    "ann_index_incremental",
    "ann_index_streamed",
    "term_index_incremental",
    "term_index_compacted",
    "neardup_cc_incremental",
    "quality_classifier_scores",
    "colbert_maxsim_topk",
    "versioned_time_travel",
    "embedding_drift_registers",
    "corpus_stats_registers",
    "cm_frequency_registers",
    "lm_counts_incremental",
    "knn_graph_mutual",
    "entity_lpa_communities_k3",
    "hybrid_weighted_topk",
    "bloom_membership_profile",
    "bpe_train_merges",
    "binary_auc",
    "remove_shared_spans",
    "minhash_lsh_pairs",
    "bm25_index_topk",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r17")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from vector_graph_rag_spark.queries import load_all
    from vector_graph_rag_spark.session import get_spark

    spark = get_spark(app_name="vgrag_plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all(include_retired=True)
    names = args.queries.split(",") if args.queries else DEFAULT_QUERIES

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        q = registry.get(name)
        if q is None:
            print(f"# {name}: not in registry, skipped", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        try:
            df = q.fn(spark, args.sf)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # capture the failure instead of dying
            text = f"EXPLAIN FAILED: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"# wrote {path} ({len(text)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
