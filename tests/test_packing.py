"""Fixed-block token packing — exact concat-and-slice twin, partition
invariance, span handling, and the BPE id-encoding front end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_graph_rag_spark.operators.packing import pack_fixed_blocks

EOD = 9999
B = 7


def _encoded(spark, lengths):
    """Synthetic (doc_id, ids) frame: doc d gets ids [d*100 .. d*100+len)."""
    rows = [
        (d, list(range(d * 100, d * 100 + n))) for d, n in enumerate(lengths)
    ]
    return spark.createDataFrame(rows, "doc_id long, ids array<int>")


def _python_twin(lengths):
    stream = []
    for d, n in enumerate(lengths):
        stream.extend(range(d * 100, d * 100 + n))
        stream.append(EOD)
    blocks = {}
    for b in range(len(stream) // B):
        blocks[b] = stream[b * B : (b + 1) * B]
    return blocks


# lengths exercise: empty doc (eod only), doc shorter than a block, doc
# exactly filling the remainder, doc spanning >2 blocks
LENGTH_SETS = [
    [3, 0, 25, 6, 1, 13],
    [20],
    [1, 1, 1, 1, 1, 1, 1, 1],
    [6, 6, 6],  # each doc+eod exactly one block
    [0, 0, 0, 0, 0, 0, 0],  # eod-only stream
    [200],  # one document spanning ~29 blocks
    [13, 6, 20, 6],  # mixed boundary-exact and spanning
]


@pytest.mark.parametrize("lengths", LENGTH_SETS)
def test_matches_python_concat_and_slice(spark, lengths):
    got = {
        r["block_id"]: list(r["ids"])
        for r in pack_fixed_blocks(_encoded(spark, lengths), B, EOD).collect()
    }
    assert got == _python_twin(lengths)


def test_partitioning_invariant(spark):
    lengths = [5, 17, 2, 0, 31, 8, 8, 3]
    enc = _encoded(spark, lengths)
    a = {
        r["block_id"]: list(r["ids"])
        for r in pack_fixed_blocks(enc.repartition(1), B, EOD, partitions=2).collect()
    }
    b = {
        r["block_id"]: list(r["ids"])
        for r in pack_fixed_blocks(
            enc.repartition(16, "doc_id"), B, EOD, partitions=5
        ).collect()
    }
    assert a == b == _python_twin(lengths)


def test_empty_corpus_and_bad_block_len(spark):
    empty = spark.createDataFrame([], "doc_id long, ids array<int>")
    assert pack_fixed_blocks(empty, B, EOD).count() == 0
    with pytest.raises(ValueError, match="block_len"):
        pack_fixed_blocks(empty, 0, EOD)


def test_plan_has_no_single_partition_and_no_python(spark):
    enc = _encoded(spark, [10, 20, 30, 40])
    plan = (
        pack_fixed_blocks(enc, B, EOD, partitions=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_bpe_encode_ids_roundtrip(spark):
    from vector_graph_rag_spark.operators.bpe import bpe_encode_ids, train_bpe
    from vector_graph_rag_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    ).limit(50)
    model = train_bpe(docs, n_merges=10, min_pair_count=1)
    enc = bpe_encode_ids(docs, model)
    vocab = model["vocab"]
    rows = enc.collect()
    # one row per input document — token-less docs come back with ids=[]
    # so their eod sentinel survives into pack_fixed_blocks (ADVICE r7)
    assert len(rows) == docs.count()
    for r in rows[:10]:
        assert r["n_ids"] == len(r["ids"])
        assert all(0 <= i <= len(vocab) for i in r["ids"])
    # round-trip: decoding ids through the vocab reproduces the document's
    # whitespace tokens (EOW markers delimit words)
    r0 = min(rows, key=lambda r: r["doc_id"])
    text = {d["doc_id"]: d["text"] for d in docs.collect()}[r0["doc_id"]]
    decoded = "".join(
        vocab[i] if i < len(vocab) else "<unk>" for i in r0["ids"]
    ).replace("</w>", " ").strip()
    assert decoded == " ".join(text.split())


def test_bpe_ids_pack_end_to_end(spark):
    """The full final-mile path: train -> encode -> pack; total packed
    tokens == floor(total ids + eods / B) * B."""
    from vector_graph_rag_spark.operators.bpe import bpe_encode_ids, train_bpe
    from vector_graph_rag_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    ).limit(40)
    model = train_bpe(docs, n_merges=8, min_pair_count=1)
    enc = bpe_encode_ids(docs, model)
    total = enc.agg(F.sum(F.size("ids") + 1)).collect()[0][0]
    blocks = pack_fixed_blocks(enc, 128, eod_id=len(model["vocab"]) + 1)
    n_blocks = blocks.count()
    assert n_blocks == total // 128
    assert blocks.filter(F.size("ids") != 128).count() == 0


def test_shuffle_blocks_deterministic_permutation(spark):
    from vector_graph_rag_spark.operators.packing import shuffle_blocks

    blocks = pack_fixed_blocks(_encoded(spark, [5, 17, 2, 31, 8, 8, 3]), B, EOD)
    base = [r["block_id"] for r in blocks.collect()]
    e0a = [r["block_id"] for r in shuffle_blocks(blocks, seed=0).collect()]
    e0b = [
        r["block_id"]
        for r in shuffle_blocks(blocks.repartition(7), seed=0).collect()
    ]
    e1 = [r["block_id"] for r in shuffle_blocks(blocks, seed=1).collect()]
    assert e0a == e0b  # reproducible across partitionings
    assert sorted(e0a) == sorted(base) == sorted(e1)  # same blocks
    assert e0a != e1  # different epoch, different order
    plan = shuffle_blocks(blocks)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    lengths=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=12),
    block_len=st.integers(min_value=1, max_value=11),
)
def test_property_concat_and_slice(spark, lengths, block_len):
    """Randomized lengths × block sizes against the Python twin — the
    exactness claim beyond handpicked cases."""
    got = {
        r["block_id"]: list(r["ids"])
        for r in pack_fixed_blocks(_encoded(spark, lengths), block_len, EOD).collect()
    }
    stream = []
    for d, n in enumerate(lengths):
        stream.extend(range(d * 100, d * 100 + n))
        stream.append(EOD)
    exp = {
        b: stream[b * block_len : (b + 1) * block_len]
        for b in range(len(stream) // block_len)
    }
    assert got == exp


def test_null_ids_treated_as_empty_document(spark):
    """size(NULL) = -1 must not poison the stream: a NULL ids array is an
    empty document contributing only its eod (review finding r7)."""
    rows = [(0, [1, 2, 3]), (1, None), (2, [4, 5, 6, 7, 8])]
    df = spark.createDataFrame(rows, "doc_id long, ids array<int>")
    got = {
        r["block_id"]: list(r["ids"])
        for r in pack_fixed_blocks(df, 5, EOD).collect()
    }
    stream = [1, 2, 3, EOD, EOD, 4, 5, 6, 7, 8, EOD]
    exp = {b: stream[b * 5 : (b + 1) * 5] for b in range(len(stream) // 5)}
    assert got == exp


def test_pack_matches_duckdb_twin_on_documents(spark):
    """Cross-engine oracle readiness (r8 swap candidate): the whole
    packing dataflow — portable hash ids, global prefix-sum offsets,
    concat-and-slice — reproduces EXACTLY in DuckDB over the real
    documents table."""
    import duckdb

    from vector_graph_rag_spark.functions.hashing import hash60
    from vector_graph_rag_spark.functions.text import tokens
    from vector_graph_rag_spark.sources.tables import load_table

    Bn, eod = 64, 1000
    duck = {
        r[0]: list(r[1])
        for r in duckdb.connect()
        .execute(
            f"""
            WITH toks AS (
              SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts
              FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
            ),
            enc AS (
              SELECT doc_id,
                     list_append(
                       list_transform(ts, t -> CAST(CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 1000 AS INT)),
                       {eod}) AS a
              FROM toks
            ),
            off AS (
              SELECT doc_id, a,
                     COALESCE(SUM(len(a)) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
              FROM enc
            ),
            tok AS (
              SELECT (o.s + u.i - 1) // {Bn} AS block_id, o.s + u.i - 1 AS pos, o.a[u.i] AS id
              FROM off o, UNNEST(range(1, len(o.a) + 1)) AS u(i)
            )
            SELECT block_id, list(id ORDER BY pos) AS ids
            FROM tok GROUP BY block_id HAVING COUNT(*) = {Bn}
            """
        )
        .fetchall()
    }
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    enc = docs.select(
        "doc_id",
        F.transform(tokens("text"), lambda t: (hash60(t) % 1000).cast("int")).alias("ids"),
    )
    got = {
        r["block_id"]: list(r["ids"])
        for r in pack_fixed_blocks(enc, Bn, eod, partitions=5).collect()
    }
    assert got == duck

def test_bpe_encode_ids_keeps_tokenless_docs(spark):
    """Empty / whitespace-only documents must appear with n_ids=0, ids=[]
    so pack_fixed_blocks sees their eod sentinel (ADVICE r7)."""
    from vector_graph_rag_spark.operators.bpe import bpe_encode_ids, train_bpe

    docs = spark.createDataFrame(
        [(0, "hello hello world"), (1, ""), (2, "   "), (3, "world")],
        "doc_id long, text string",
    )
    model = train_bpe(docs, n_merges=3, min_pair_count=1)
    got = {r["doc_id"]: r for r in bpe_encode_ids(docs, model).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[1]["n_ids"] == 0 and list(got[1]["ids"]) == []
    assert got[2]["n_ids"] == 0 and list(got[2]["ids"]) == []
    assert got[0]["n_ids"] > 0 and got[3]["n_ids"] > 0
    # through the packer: 4 docs -> 4 eods in the virtual stream
    blocks = pack_fixed_blocks(bpe_encode_ids(docs, model), 1, eod_id=777)
    stream = [r["ids"][0] for r in sorted(blocks.collect(), key=lambda r: r["block_id"])]
    assert stream.count(777) == 4
