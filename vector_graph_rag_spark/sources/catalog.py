"""Graph catalog: one directory per graph, five parquet tables each.

Mirrors the reference's collection_prefix multi-tenancy
(/root/reference/src/vector_graph_rag/storage/milvus.py:66-74): a "graph"
named `g` is `{root}/g/{entities,relations,passages,entity_relation,
relation_passage}.parquet`.  Catalog ops map 1:1:

- list_graphs  ← MilvusStore.list_graphs suffix-matching (milvus.py:847-924)
- delete_graph ← drop of the 3 collections (milvus.py:926-978)
- write_graph  ← drop_collections+create_collections+insert — the
  reference's add_documents is full-rebuild overwrite (rag.py:354-356),
  which is exactly `mode("overwrite")`.

At 100 TB each table write is partition-parallel parquet; `entities` and
`relations` are written repartitioned by id so later point-lookup joins
co-locate (and downstream readers can bucket on id).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import SparkSession

from vector_graph_rag_spark.graph.builder import GraphTables

TABLE_NAMES = [
    "entities",
    "relations",
    "passages",
    "entity_relation",
    "relation_passage",
]


@dataclass
class GraphCatalog:
    root: str

    def _graph_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def list_graphs(self) -> list[dict]:
        """[{name, has_all_tables}] sorted by name (milvus.py:847-924)."""
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in sorted(os.listdir(self.root)):
            d = self._graph_dir(name)
            if not os.path.isdir(d):
                continue
            present = {
                t for t in TABLE_NAMES if os.path.exists(os.path.join(d, f"{t}.parquet"))
            }
            out.append({"name": name, "has_all_tables": present == set(TABLE_NAMES)})
        return out

    def delete_graph(self, name: str) -> bool:
        """Drop the graph's directory (milvus.py:926-978). True if it existed."""
        d = self._graph_dir(name)
        if not os.path.isdir(d):
            return False
        shutil.rmtree(d)
        return True

    def write_graph(self, name: str, tables: GraphTables, partitions: int | None = None) -> None:
        """Overwrite-write all five tables (add_documents semantics,
        rag.py:354-356).  Node tables are repartitioned by id."""
        d = self._graph_dir(name)
        os.makedirs(d, exist_ok=True)

        def _write(df, fname: str, key: str | None):
            if partitions and key:
                df = df.repartition(partitions, key)
            df.write.mode("overwrite").parquet(os.path.join(d, f"{fname}.parquet"))

        _write(tables.entities, "entities", "id")
        _write(tables.relations, "relations", "id")
        _write(tables.passages, "passages", "id")
        _write(tables.entity_relation, "entity_relation", "entity_id")
        _write(tables.relation_passage, "relation_passage", "relation_id")

    def compact_graph(
        self, spark: SparkSession, name: str, target_files: int = 1
    ) -> dict[str, int]:
        """Rewrite each table at ``target_files`` files per table — the
        small-files maintenance job.

        Incremental CRUD (upsert_passages, cascade deletes) rewrites tables
        at task parallelism, so a long-lived graph accumulates many small
        parquet files; at 100 TB scan cost is dominated by file-open and
        footer reads, so periodic compaction (here `coalesce`, on a cluster
        the same job with a size-based target) restores scan efficiency.
        Writes go through a staging directory + atomic swap so concurrent
        readers never see a half-compacted table.  Returns files-per-table
        after compaction.
        """
        d = self._graph_dir(name)
        out: dict[str, int] = {}
        for t in TABLE_NAMES:
            path = os.path.join(d, f"{t}.parquet")
            staging = path + ".compacting"
            spark.read.parquet(path).coalesce(target_files).write.mode(
                "overwrite"
            ).parquet(staging)
            shutil.rmtree(path)
            os.rename(staging, path)
            out[t] = sum(
                1
                for f in os.listdir(path)
                if f.startswith("part-") and not f.endswith(".crc")
            )
        return out

    def read_graph(self, spark: SparkSession, name: str) -> GraphTables:
        d = self._graph_dir(name)
        r = {t: spark.read.parquet(os.path.join(d, f"{t}.parquet")) for t in TABLE_NAMES}
        return GraphTables(
            entities=r["entities"],
            relations=r["relations"],
            passages=r["passages"],
            entity_relation=r["entity_relation"],
            relation_passage=r["relation_passage"],
        )

    def graph_stats(self, spark: SparkSession, name: str) -> dict:
        """Row counts per table (get_collection_stats, milvus.py:980-1014)."""
        g = self.read_graph(spark, name)
        return {
            "entities": g.entities.count(),
            "relations": g.relations.count(),
            "passages": g.passages.count(),
        }
