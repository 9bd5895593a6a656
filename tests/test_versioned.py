"""VersionedCorpus — MERGE semantics, time travel, CDC diff, retention."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from vector_graph_rag_spark.sources.tables import load_table
from vector_graph_rag_spark.sources.versioned import VersionedCorpus

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def store(spark, tmp_path):
    return VersionedCorpus(spark, str(tmp_path / "corpus"))


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


def test_write_read_time_travel(spark, store):
    docs = _docs(spark)
    v1 = store.write(docs)
    v2 = store.write(docs.filter(F.col("doc_id") % 2 == 0))
    assert (v1, v2) == (1, 2)
    assert store.latest_version() == 2
    n_all = docs.count()
    assert store.read().count() == docs.filter(F.col("doc_id") % 2 == 0).count()
    assert store.read(version=1).count() == n_all  # VERSION AS OF
    with pytest.raises(ValueError, match="does not exist"):
        store.read(version=9)
    with pytest.raises(ValueError, match="does not exist"):
        VersionedCorpus(spark, store.root + "_empty").read()


def test_merge_upsert_insert_delete(spark, store):
    docs = _docs(spark)
    store.write(docs)
    updates = spark.createDataFrame(
        [
            (0, "REWRITTEN", False),     # matched -> update
            (1_000_001, "BRAND NEW", False),  # unmatched -> insert
            (1, None, True),             # matched + marker -> delete
            (1_000_002, "x", True),      # unmatched + marker -> no-op
        ],
        "doc_id long, text string, is_delete boolean",
    )
    v2 = store.merge(updates, key="doc_id", delete_col="is_delete")
    assert v2 == 2
    cur = {r["doc_id"]: r["text"] for r in store.read().collect()}
    base = {r["doc_id"]: r["text"] for r in docs.collect()}
    exp = dict(base)
    exp[0] = "REWRITTEN"
    exp[1_000_001] = "BRAND NEW"
    del exp[1]
    assert cur == exp
    # v1 untouched (snapshot isolation)
    assert {r["doc_id"]: r["text"] for r in store.read(1).collect()} == base


def test_merge_into_empty_store_bootstraps(spark, store):
    docs = _docs(spark)
    v = store.merge(docs)
    assert v == 1
    assert store.read().count() == docs.count()


def test_diff_is_the_cdc_feed(spark, store):
    docs = _docs(spark)
    store.write(docs)
    updates = spark.createDataFrame(
        [(0, "REWRITTEN", False), (1_000_001, "NEW", False), (13, None, True)],
        "doc_id long, text string, is_delete boolean",
    )
    store.merge(updates, key="doc_id", delete_col="is_delete")
    got = {r["doc_id"]: r["change"] for r in store.diff(1, 2).collect()}
    exp = {0: "changed", 1_000_001: "added", 13: "removed"}
    # doc 0's text may coincide only if the original was already REWRITTEN
    assert got == exp


def test_vacuum_retention_and_manifest_atomicity(spark, store):
    docs = _docs(spark)
    for i in range(4):
        store.write(docs.filter(F.col("doc_id") % 4 <= i))
    removed = store.vacuum(keep_last=2)
    assert removed == [1, 2]
    assert store.versions() == [1, 2, 3, 4]  # history is append-only
    with pytest.raises(ValueError, match="vacuumed"):
        store.read(1)
    assert store.read(3).count() > 0
    assert store.read().count() == docs.count()
    # manifest is valid JSON on disk (single atomic file, no .tmp left)
    with open(os.path.join(store.root, "_manifest.json")) as f:
        m = json.load(f)
    assert m["latest"] == 4
    assert not os.path.exists(os.path.join(store.root, "_manifest.json.tmp"))


def test_merge_commit_is_delta_sized_not_a_snapshot_rewrite(spark, store):
    """The r7 merge-on-read upgrade: a MERGE commit writes ONLY the
    upserted rows + tombstone keys — O(changes), never a corpus rewrite
    (the r6 layout rewrote a full snapshot per commit)."""
    docs = _docs(spark)
    n_docs = docs.count()
    store.write(docs)
    updates = spark.createDataFrame(
        [(0, "REWRITTEN", False), (1_000_001, "NEW", False), (13, None, True)],
        "doc_id long, text string, is_delete boolean",
    )
    v2 = store.merge(updates, key="doc_id", delete_col="is_delete")
    # the committed layer holds 2 adds + 1 tombstone, not n_docs rows
    assert spark.read.parquet(store._adds_dir(v2)).count() == 2
    assert spark.read.parquet(store._dels_dir(v2)).count() == 1
    info = store._manifest()["versions"][str(v2)]
    assert info["kind"] == "delta" and info["adds"] == 2 and info["deletes"] == 1
    # and the merge-on-read view is still the full corpus
    assert store.read().count() == n_docs + 1 - 1


def test_delete_then_reinsert_resurrects_key(spark, store):
    """Latest-wins across the layer chain: a key deleted in v2 and
    re-inserted in v3 must be live in v3 with the new content, and still
    absent when time-traveling to v2."""
    docs = _docs(spark)
    store.write(docs)
    store.merge(
        spark.createDataFrame([(5, None, True)], "doc_id long, text string, is_delete boolean"),
        delete_col="is_delete",
    )
    store.merge(
        spark.createDataFrame([(5, "REBORN", False)], "doc_id long, text string, is_delete boolean"),
        delete_col="is_delete",
    )
    assert store.read(2).filter(F.col("doc_id") == 5).count() == 0
    got = store.read(3).filter(F.col("doc_id") == 5).collect()
    assert [r["text"] for r in got] == ["REBORN"]
    assert store.read(3).count() == docs.count()


def test_compact_folds_chain_and_unpins_vacuum(spark, store):
    """compact() = Iceberg MoR compaction: same content as the folded
    chain, plain-scan reads, and the pre-base layers become
    vacuum-eligible (deltas pin their base until then)."""
    docs = _docs(spark)
    store.write(docs)
    store.merge(spark.createDataFrame([(0, "X")], "doc_id long, text string"))
    store.merge(spark.createDataFrame([(1, "Y")], "doc_id long, text string"))
    # deltas pin the base: nothing is removable while v3 needs v1..v3
    assert store.vacuum(keep_last=1) == []
    before = {r["doc_id"]: r["text"] for r in store.read().collect()}
    v4 = store.compact()
    assert store._manifest()["versions"][str(v4)]["kind"] == "base"
    after = {r["doc_id"]: r["text"] for r in store.read().collect()}
    assert after == before
    # base reads are plain scans — no window, no shuffle in the plan
    plan = store.read()._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Exchange" not in plan
    assert store.vacuum(keep_last=1) == [1, 2, 3]
    with pytest.raises(ValueError, match="vacuumed"):
        store.read(2)
    assert store.read(v4).count() == docs.count()


def test_merge_rejects_duplicate_source_keys(spark, store):
    """Delta MERGE INTO errors on multiple source rows per target key —
    silently inserting both would duplicate the key (ADVICE r6)."""
    store.write(_docs(spark))
    dup_updates = spark.createDataFrame(
        [(0, "first"), (0, "second"), (7, "fine")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="duplicate source rows"):
        store.merge(dup_updates)
    # store unchanged — the failed merge committed nothing
    assert store.latest_version() == 1


def test_vacuum_never_drops_the_head(spark, store):
    """keep_last < 1 would delete the latest snapshot and brick read()
    (ADVICE r6) — rejected up front, nothing removed."""
    store.write(_docs(spark))
    for bad in (0, -1):
        with pytest.raises(ValueError, match="keep_last must be >= 1"):
            store.vacuum(keep_last=bad)
    assert store.read().count() > 0
    # keep_last=1 retains exactly the head
    store.write(_docs(spark).limit(3))
    removed = store.vacuum(keep_last=1)
    assert removed == [1]
    assert store.read().count() == 3


def test_empty_merge_and_base_only_compact(spark, store):
    """Degenerate commits must stay consistent: a zero-row MERGE still
    commits a (no-op) version, and compact() of a base-only store is a
    plain re-base."""
    docs = _docs(spark)
    store.write(docs)
    v2 = store.merge(
        spark.createDataFrame([], "doc_id long, text string")
    )
    assert v2 == 2
    assert store.read().count() == docs.count()
    v3 = store.compact()
    assert store._manifest()["versions"][str(v3)]["kind"] == "base"
    assert store.read(v3).count() == docs.count()


def test_merge_rejects_rekeyed_chain(spark, store):
    """A delta chain has ONE merge key; re-keying mid-chain would make
    latest-wins nonsense — rejected until compact()."""
    docs = _docs(spark).withColumn("alt_key", F.col("doc_id") + 1)
    store.write(docs)
    store.merge(
        spark.createDataFrame([(0, "X", 1)], "doc_id long, text string, alt_key long")
    )
    with pytest.raises(ValueError, match="compact"):
        store.merge(
            spark.createDataFrame(
                [(9, "Y", 10)], "doc_id long, text string, alt_key long"
            ),
            key="alt_key",
        )


def test_chain_read_plan_one_keyed_shuffle_no_cartesian(spark, store):
    """The merge-on-read fold must cost exactly ONE hash shuffle on the
    MERGE key (the latest-wins window), with no cartesian product and no
    Python in the plan — the price of an un-compacted chain."""
    docs = _docs(spark)
    store.write(docs)
    store.merge(spark.createDataFrame([(0, "X")], "doc_id long, text string"))
    plan = store.read()._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning(doc_id") == 1, plan[:2000]
    assert "SinglePartition" not in plan


def test_legacy_snapshot_layout_still_readable(spark, store):
    """Stores committed by the pre-merge-on-read layout (full snapshot
    directly under v*/, manifest entries without 'kind') must stay
    readable and mergeable — history is an append-only fact."""
    import json

    docs = _docs(spark)
    # hand-build an r6-layout store
    docs.write.mode("overwrite").parquet(store._vdir(1))
    store._commit_manifest(
        {"latest": 1, "versions": {"1": {"rows": docs.count(), "parent": 0}}}
    )
    assert store.read().count() == docs.count()
    assert store.read(1).count() == docs.count()
    # a new-layout delta merges on top of the legacy base
    v2 = store.merge(spark.createDataFrame([(0, "UPGRADED")], "doc_id long, text string"))
    assert v2 == 2
    got = {r["doc_id"]: r["text"] for r in store.read().collect()}
    assert got[0] == "UPGRADED" and len(got) == docs.count()


def test_merge_refuses_dup_key_base(spark, store):
    """A base may hold duplicate keys (write() takes any frame), but
    chaining a delta on top would let read()'s latest-wins window
    silently collapse the duplicates to one arbitrary survivor — merge
    must refuse instead (ADVICE r7).  The validation is memoized in the
    manifest, so a clean base is scanned once per key, not per merge."""
    dup = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "doc_id long, text string"
    )
    store.write(dup)
    with pytest.raises(ValueError, match="duplicate rows for key"):
        store.merge(spark.createDataFrame([(3, "d")], "doc_id long, text string"))
    # base layer untouched and still fully readable (both dup rows)
    assert store.read().count() == 3
    # a clean base chains fine, and the validation is memoized
    clean = spark.createDataFrame([(1, "a"), (2, "c")], "doc_id long, text string")
    v = store.write(clean)
    store.merge(spark.createDataFrame([(3, "d")], "doc_id long, text string"))
    m = json.load(open(store._manifest_path))
    assert m["versions"][str(v)]["unique_keys"] == ["doc_id"]
    assert store.read().count() == 3


def test_maybe_compact_policy_resets_chain_and_plan(spark, store):
    """Auto-compaction (r7 verdict, Next #6): once the live chain reaches
    max_chain layers, maybe_compact folds it into a new base — chain
    length resets to 1 and the read plan drops back to a plain scan
    (no Exchange, no Window)."""
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(20)], "doc_id long, text string"
    )
    store.write(docs)
    assert store.chain_length() == 1
    assert store.maybe_compact(max_chain=3) is None  # base only — no-op
    for i in range(2):  # two deltas -> chain of 3
        store.merge(
            spark.createDataFrame([(i, f"v{i}")], "doc_id long, text string")
        )
    assert store.chain_length() == 3
    plan_before = store.read()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan_before  # MoR fold shuffles on the key
    v = store.maybe_compact(max_chain=3)
    assert v == 4 and store.chain_length() == 1
    plan_after = store.read()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_after and "Window" not in plan_after
    got = {r["doc_id"]: r["text"] for r in store.read().collect()}
    assert got[0] == "v0" and got[1] == "v1" and len(got) == 20
    with pytest.raises(ValueError, match="max_chain"):
        store.maybe_compact(max_chain=1)


def test_bucketed_base_lookup_prunes_partitions(spark, store):
    """write(bucket_by): the base lays out hash-partitioned by the key;
    lookup() carries a PartitionFilter on the layout column (only 1/n of
    the base is read), results match a full-read filter, and plain read()
    never leaks the internal __kb column."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    store.write(docs, bucket_by=("doc_id", 8))
    assert store.read().columns == ["doc_id", "text"]
    assert store.read().count() == 200
    got = store.lookup(42).collect()
    assert [(r["doc_id"], r["text"]) for r in got] == [(42, "text 42")]
    plan = store.lookup(42)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(__kb" in plan or "__kb" in plan.split("PartitionFilters")[1][:200]
    # chain on top: lookup folds deltas for the key, still pruned base-side
    store.merge(spark.createDataFrame([(42, "EDITED")], "doc_id long, text string"))
    store.merge(
        spark.createDataFrame(
            [(7, None, True)], "doc_id long, text string, is_delete boolean"
        ),
        delete_col="is_delete",
    )
    assert [r["text"] for r in store.lookup(42).collect()] == ["EDITED"]
    assert store.lookup(7).count() == 0
    assert store.lookup(41).collect()[0]["text"] == "text 41"
    # compact preserves the layout by default; lookups stay pruned
    v = store.compact()
    info = store._manifest()["versions"][str(v)]
    assert (info["bucket_key"], info["bucket_n"]) == ("doc_id", 8)
    plan2 = store.lookup(42)._jdf.queryExecution().executedPlan().toString()
    assert "__kb" in plan2
    assert [r["text"] for r in store.lookup(42).collect()] == ["EDITED"]
    assert store.read().count() == 199  # 7 deleted


def test_lookup_on_unkeyed_plain_base_raises(spark, store):
    store.write(spark.createDataFrame([(1, "a")], "doc_id long, text string"))
    with pytest.raises(ValueError, match="keyed store"):
        store.lookup(1)

def test_merge_key_must_match_base_bucket_key(spark, store):
    """merge() on a bucketed base refuses a key that differs from
    bucket_key (ADVICE r8): lookup() partition-prunes the base on
    bucket_key but folds latest-wins on the chain key — a mismatched
    chain could prune away the very rows the deltas supersede and
    disagree with read().filter(key == value)."""
    docs = spark.createDataFrame(
        [(i, f"u{i}", f"text {i}") for i in range(50)],
        "doc_id long, uid string, text string",
    )
    store.write(docs, bucket_by=("doc_id", 4))
    with pytest.raises(ValueError, match="bucket_key"):
        store.merge(
            spark.createDataFrame(
                [(99, "u99", "new")], "doc_id long, uid string, text string"
            ),
            key="uid",
        )
    # the matching key still merges, and lookup folds correctly
    store.merge(
        spark.createDataFrame(
            [(7, "u7", "EDITED")], "doc_id long, uid string, text string"
        )
    )
    assert [r["text"] for r in store.lookup(7).collect()] == ["EDITED"]
