"""Distributed BPE training vs a straight-line Python twin of Sennrich's
algorithm (same tie-break), plus plan/scale invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_graph_rag_spark.operators.bpe import (
    EOW,
    _segment_word_python,
    bpe_token_stats,
    bpe_tokenize,
    train_bpe,
    word_counts,
)
from vector_graph_rag_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _toks(s: str) -> list[str]:
    return [t for t in s.split(" ") if t]


def _python_bpe(word_freq: dict[str, int], n_merges: int, min_pair_count: int = 2):
    """Sennrich BPE on a word-frequency table; tie-break (count desc,
    left asc, right asc) — the twin of train_bpe."""
    segs = {w: list(w) + [EOW] for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_freq[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        for w in segs:
            segs[w] = _apply(segs[w], a, b)
    return merges, segs


def _apply(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    pend = None
    for s in syms:
        if pend is None:
            pend = s
        elif pend == a and s == b:
            out.append(a + b)
            pend = None
        else:
            out.append(pend)
            pend = s
    if pend is not None:
        out.append(pend)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    return docs, rows


@pytest.fixture(scope="module")
def model(spark, corpus):
    docs, _ = corpus
    return train_bpe(docs, n_merges=30)


def test_merge_sequence_matches_python_twin(spark, corpus, model):
    docs, rows = corpus
    freq: dict[str, int] = {}
    for text in rows.values():
        for w in _toks(text):
            freq[w] = freq.get(w, 0) + 1
    exp_merges, exp_segs = _python_bpe(freq, n_merges=30)

    assert model["merges"] == exp_merges
    got_segs = {
        r["w"]: list(r["pieces"]) for r in model["word_pieces"].collect()
    }
    assert got_segs == exp_segs
    # word counts in the byproduct match the raw frequency table
    got_freq = {r["w"]: r["cnt"] for r in model["word_pieces"].collect()}
    assert got_freq == freq


def test_merges_are_deterministic_across_parallelism(spark, corpus):
    docs, _ = corpus
    m1 = train_bpe(docs, n_merges=12)["merges"]
    m2 = train_bpe(docs.repartition(7), n_merges=12)["merges"]
    assert m1 == m2


def test_tokenize_known_and_oov(spark, corpus, model):
    docs, rows = corpus
    # known-word path: tokenizing the training corpus reproduces the
    # training segmentations word-for-word
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], list(r["pieces"]))
        for r in bpe_tokenize(docs, model).collect()
    }
    segs = {r["w"]: list(r["pieces"]) for r in model["word_pieces"].collect()}
    for doc_id, text in rows.items():
        ws = _toks(text)
        if not ws:
            assert doc_id not in got
            continue
        exp_pieces = [p for w in ws for p in segs[w]]
        assert got[doc_id] == (len(ws), len(exp_pieces), exp_pieces)

    # OOV path: unseen words replay the merge list (UDF == training fold)
    oov = spark.createDataFrame(
        [(1, "zzzqqq unknownword"), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: list(r["pieces"]) for r in bpe_tokenize(oov, model).collect()}
    exp = _segment_word_python("zzzqqq", model["merges"]) + _segment_word_python(
        "unknownword", model["merges"]
    )
    assert out == {1: exp}  # empty doc 2 has no row


def test_token_stats_consistent(spark, corpus, model):
    docs, rows = corpus
    row = bpe_token_stats(docs, model).collect()[0]
    total_words = sum(len(_toks(t)) for t in rows.values())
    assert row["total_words"] == total_words
    assert row["n_docs"] == sum(1 for t in rows.values() if _toks(t))
    assert row["total_pieces"] >= row["total_words"]  # EOW guarantees >= 1 piece/word
    assert row["pieces_per_word"] == pytest.approx(
        row["total_pieces"] / row["total_words"]
    )


def test_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    model = train_bpe(docs, n_merges=5)
    assert model["merges"] == []
    assert model["word_pieces"].count() == 0


def test_training_plan_stays_jvm_side(spark, corpus):
    """The training iteration must stay pure JVM: pair counting and the
    merge fold compile without Python eval nodes or cartesian products."""
    docs, _ = corpus
    from vector_graph_rag_spark.operators.bpe import (
        _adjacent_pairs,
        _apply_merge,
        _chars_with_eow,
    )

    syms = word_counts(docs).select(
        "w", "cnt", _chars_with_eow(F.col("w")).alias("syms")
    )
    pairs = (
        syms.select("cnt", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").alias("n"))
    )
    argmax = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1)
    merged = syms.select(_apply_merge(F.col("syms"), "a", "b").alias("syms"))
    for df in (pairs, argmax, merged):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
    # the argmax is a local top-1, never a global sort
    assert "TakeOrderedAndProject" in argmax._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "word,pair",
    [
        ("aaa", ("a", "a")),      # overlapping run, odd
        ("aaaa", ("a", "a")),     # overlapping run, even
        ("abab", ("a", "b")),     # alternating, pair matches at 0 and 2
        ("abab", ("b", "a")),     # alternating, pair matches mid-word
        ("aabaa", ("a", "a")),    # runs split by a gap
        ("xy", ("x", "y")),       # whole word one merge
        ("x", ("x", "x")),        # single char + EOW, no match
    ],
)
def test_merge_fold_overlap_semantics(spark, word, pair):
    """The Spark F.aggregate fold and the Python replay must agree on
    left-to-right NON-OVERLAPPING application — the classic BPE subtlety
    ('aaa' + (a,a) -> [aa, a], never [a, aa] or [aa, aa])."""
    from vector_graph_rag_spark.operators.bpe import (
        _apply_merge,
        _chars_with_eow,
        _segment_word_python,
    )

    df = spark.createDataFrame([(word,)], "w string").select(
        _apply_merge(_chars_with_eow(F.col("w")), *pair).alias("syms")
    )
    got = list(df.collect()[0]["syms"])
    assert got == _segment_word_python(word, [pair])



def test_tokenize_joins_are_aqe_chosen_not_forced_broadcast(spark):
    """At web scale the word->pieces table is vocab-sized (10^7-10^8
    rows) — a FORCED broadcast there is a guaranteed executor OOM, so
    bpe_tokenize must carry no F.broadcast hint and rely on AQE, which
    still broadcasts at test scale (both facts pinned)."""
    import inspect

    from vector_graph_rag_spark.operators import bpe as bpe_mod
    from vector_graph_rag_spark.operators.bpe import bpe_tokenize, train_bpe
    from vector_graph_rag_spark.sources.tables import load_table

    src = inspect.getsource(bpe_mod.bpe_tokenize)
    assert "F.broadcast(" not in src, "bpe_tokenize reintroduced a forced broadcast"
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    ).limit(60)
    model = train_bpe(docs, n_merges=6, min_pair_count=1)
    tok = bpe_tokenize(docs, model)
    assert tok.count() == 60
    plan = tok._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # AQE's choice at small vocab


# --- r14: batched-argmax escape (r13 verdict, Next #7) -----------------------


def _python_bpe_batched(
    word_freq: dict[str, int], n_merges: int, B: int, min_pair_count: int = 2
):
    """Python twin of train_bpe(batch_argmax=B): per round, greedy-select
    up to B symbol-disjoint pairs down the exact (count desc, a, b) order
    — considering only the top B*8 candidates, the operator's over-fetch
    contract (an under-filled round is legal: the next round recounts) —
    and apply them in order."""
    segs = {w: list(w) + [EOW] for w in word_freq}
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        counts: dict[tuple[str, str], int] = {}
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_freq[w]
        cand = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        cand = cand[: B * 8] if B > 1 else cand[:1]
        selected: list[tuple[str, str]] = []
        used: set[str] = set()
        room = min(B, n_merges - len(merges))
        for (a, b), n in cand:
            if n < min_pair_count:
                break
            if a in used or b in used or (a + b) in used:
                continue
            selected.append((a, b))
            used.update((a, b, a + b))
            if len(selected) >= room:
                break
        if not selected:
            break
        for a, b in selected:
            merges.append((a, b))
            for w in segs:
                segs[w] = _apply(segs[w], a, b)
    return merges, segs


def test_batched_argmax_twin(spark, corpus):
    """train_bpe(batch_argmax=B) matches its Python twin EXACTLY (merge
    list and final segmentations) at B=2 and B=8 — the Spark-side greedy
    disjoint selection and in-round fold chain are pinned end to end."""
    docs, rows = corpus
    freq: dict[str, int] = {}
    for text in rows.values():
        for w in _toks(text):
            freq[w] = freq.get(w, 0) + 1
    for B in (2, 8):
        model = train_bpe(docs, n_merges=24, batch_argmax=B)
        exp_merges, exp_segs = _python_bpe_batched(freq, 24, B)
        assert model["merges"] == exp_merges, f"B={B}"
        got_segs = {
            r["w"]: list(r["pieces"]) for r in model["word_pieces"].collect()
        }
        assert got_segs == exp_segs, f"B={B}"


def test_batched_argmax_deviation_vs_exact(spark, corpus):
    """Documented deviation of the B=8 approximation from exact Sennrich:
    B=1 is bit-identical to exact, the first merge of a batched run is
    the exact argmax (disjoint selection never reorders the winner), and
    the quality cost is bounded — measured on this corpus at n=24: merge
    sets share 54% (BPE is path-dependent, so an early divergent merge
    composes different symbols thereafter; the SET metric understates
    similarity), while downstream compression (pieces/word over the full
    corpus) stays within 10% of the exact tokenizer at the same merge
    budget (measured 6.1%: 3.877 vs 3.654)."""
    docs, rows = corpus
    freq: dict[str, int] = {}
    for text in rows.values():
        for w in _toks(text):
            freq[w] = freq.get(w, 0) + 1
    exact, _ = _python_bpe(freq, n_merges=24)
    m1 = train_bpe(docs, n_merges=24, batch_argmax=1)
    assert m1["merges"] == exact
    m8 = train_bpe(docs, n_merges=24, batch_argmax=8)
    assert m8["merges"][0] == exact[0]
    overlap = len(set(m8["merges"]) & set(exact)) / len(exact)
    assert overlap >= 0.4, f"merge-set overlap collapsed: {overlap:.2f}"
    ppw = {
        B: bpe_token_stats(docs, m).collect()[0]["pieces_per_word"]
        for B, m in ((1, m1), (8, m8))
    }
    assert ppw[8] <= ppw[1] * 1.10, ppw
