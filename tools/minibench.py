#!/usr/bin/env python
"""Isolated single-query A/B timing — same action and protocol as bench.py
(full-materialization noop write, min over N iterations, checkpoint GC
between runs), without the 86-query session around it.

Usage: python tools/minibench.py <query> [<query> ...] [--iters N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from vector_graph_rag_spark.queries import load_all
    from vector_graph_rag_spark.session import get_spark

    spark = get_spark(app_name="vgrag_minibench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all(include_retired=True)

    # same warmup as bench.py: footers + graph materialization
    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()
    from vector_graph_rag_spark.queries.graphrag import _graph

    _graph(spark, args.sf)

    def _release() -> None:
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    for name in args.queries:
        q = registry[name]
        runs = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"minibench:{name}")
            q.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            _release()
        print(f"{name}: {runs} -> min {min(runs)}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
