"""Distributed BPE tokenizer training — the subword vocabulary step of a
pretraining data pipeline (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units"; the algorithm behind GPT-2/RoBERTa-style
tokenizers).

Why this shape survives 100 TB: BPE statistics are WORD-frequency
statistics, so the corpus is touched exactly once —

1. ``groupBy(word)`` count: the ONLY corpus-sized shuffle, map-side
   combined.  Everything downstream operates on the distinct-word table
   (vocab-sized: ~10^7-10^8 rows at web scale, independent of corpus rows).
2. Per merge iteration, all on the word table: adjacent-symbol pair counts
   weighted by word frequency (``groupBy(pair)``), the argmax pair via
   ``orderBy().limit(1)`` (plans as TakeOrderedAndProject — per-partition
   local top-1, no global sort), and a row-local left-fold that applies the
   merge inside each word's symbol array (``F.aggregate`` — no shuffle).
   Lineage is bounded with ``localCheckpoint`` every few rounds, the same
   pattern as the PPR/CC iterative kernels.
3. Tokenization of new text: known words resolve through a broadcast
   word→pieces table (the training byproduct covers the whole training
   vocab); only OOV words pay the per-word merge replay, batched through
   an Arrow ``pandas_udf`` (the sanctioned non-JVM escape hatch).

Determinism: the argmax pair is tie-broken (count desc, left asc, right
asc), so the merge sequence — and therefore the entire tokenizer — is a
pure function of the corpus.  Twin-tested against a straight-line Python
implementation of Sennrich's algorithm in ``tests/test_bpe.py``.

The reference repo has no tokenizer training (its token counting is
tiktoken at query time, rag.py); this is a north-star training-pipeline
operator ("token counting (whitespace + a BPE-ish regex)" taken to the
real thing).

Design note — why NOT incremental pair-count maintenance: the classic
single-node Sennrich optimization keeps a mutable pair-count heap and per
merge updates only words containing the merged pair.  A DataFrame port
was prototyped and MEASURED 5× slower here (48s vs 10s for 12 merges at
test scale): with immutable DataFrames, "updating" the pair table means
rewriting/rechaining an O(distinct pairs) frame every iteration, which
costs as much as the recount it replaces — while the recount is one
map-side-combined explode over the word table, embarrassingly parallel
and fully pipelined.  Per-iteration cost is O(vocab) either way on
Spark; the recount has the smaller constant and no delta-chain lineage.
The honest scale lever for the 30k-merge regime is fewer driver round
trips (batching independent merges), not delta state.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_graph_rag_spark.functions.text import tokens

EOW = "</w>"  # end-of-word sentinel, standard Sennrich

_CHECKPOINT_EVERY = 8  # bound iterative lineage like the PPR kernel


def _chars_with_eow(col):
    """word → initial symbol array: characters + the end-of-word marker."""
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    return F.concat(chars, F.array(F.lit(EOW)))


def _adjacent_pairs(syms_col):
    """array<string> → array<struct<a,b>> of adjacent symbol pairs."""
    left = F.slice(syms_col, 1, F.size(syms_col) - 1)
    right = F.slice(syms_col, 2, F.size(syms_col) - 1)
    return F.zip_with(
        left, right, lambda a, b: F.struct(a.alias("a"), b.alias("b"))
    )


def _apply_merge(syms_col, a: str, b: str):
    """Left-to-right non-overlapping replacement of adjacent (a, b) with
    a+b inside the symbol array — a row-local fold, no shuffle.

    The fold carries (acc, pend): ``pend`` is the last unconsumed symbol;
    when it equals ``a`` and the next symbol is ``b`` they fuse, otherwise
    ``pend`` is flushed.  Matches the classic implementation's scan order.
    """
    merged = a + b

    def step(st, s):
        flush = F.concat(st["acc"], F.array(st["pend"]))
        return (
            F.when(
                st["pend"].isNull(),
                F.struct(st["acc"].alias("acc"), s.alias("pend")),
            )
            .when(
                (st["pend"] == F.lit(a)) & (s == F.lit(b)),
                F.struct(
                    F.concat(st["acc"], F.array(F.lit(merged))).alias("acc"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(F.struct(flush.alias("acc"), s.alias("pend")))
        )

    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("pend"),
    )
    return F.aggregate(
        syms_col,
        init,
        step,
        lambda st: F.when(
            st["pend"].isNull(), st["acc"]
        ).otherwise(F.concat(st["acc"], F.array(st["pend"]))),
    )


def _apply_merges(syms_col, pairs: list[tuple[str, str]]):
    """Apply a SYMBOL-DISJOINT set of merges in one left-to-right fold.

    For pairs sharing no symbols (the batched-argmax selection invariant),
    simultaneous application in one scan is EXACTLY sequential application
    in any order: fusing (a1,b1) replaces two tokens with one, so it never
    creates or destroys an adjacency between symbols outside {a1, b1,
    a1b1} — each (pend, next) site matches at most one pair, and greedy
    non-overlapping consumption proceeds independently per pair.  (The
    equivalence is also empirically pinned by the batched twin test, which
    applies the same pairs one at a time.)  One fold per ROUND instead of
    B folds keeps the lineage and per-action cost at the single-merge
    level — this is what buys the ~B× round-trip saving."""
    if len(pairs) == 1:
        return _apply_merge(syms_col, *pairs[0])

    def fused(pend, s):
        expr = None
        for a, b in pairs:
            cond = (pend == F.lit(a)) & (s == F.lit(b))
            val = F.lit(a + b)
            expr = F.when(cond, val) if expr is None else expr.when(cond, val)
        return expr  # null when no pair matches this adjacency

    def step(st, s):
        fuse = fused(st["pend"], s)
        flush = F.concat(st["acc"], F.array(st["pend"]))
        return (
            F.when(
                st["pend"].isNull(),
                F.struct(st["acc"].alias("acc"), s.alias("pend")),
            )
            .when(
                fuse.isNotNull(),
                F.struct(
                    F.concat(st["acc"], F.array(fuse)).alias("acc"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(F.struct(flush.alias("acc"), s.alias("pend")))
        )

    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("pend"),
    )
    return F.aggregate(
        syms_col,
        init,
        step,
        lambda st: F.when(
            st["pend"].isNull(), st["acc"]
        ).otherwise(F.concat(st["acc"], F.array(st["pend"]))),
    )


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, cnt) distinct-word frequency table — the one corpus shuffle."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_pair_count: int = 2,
    batch_argmax: int = 1,
) -> dict:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``{"merges": [(a, b), ...] in learned order,
    "merge_counts": [n, ...] (the weighted pair count each merge won with),
    "word_pieces": DF(w, cnt, pieces array<string>),
    "vocab": sorted list of final symbols}``.
    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (weighted by word frequency).

    Cost model: one corpus shuffle (word counts), then per ROUND one
    vocab-sized pair count + a TakeOrdered argmax + row-local folds.
    Driver state: the merge list (``n_merges`` string pairs).

    Wall-clock ceiling (measured, SCALE.md §Round-13 BPE ceiling): each
    round is one driver-serialized Spark action (the ``collect()`` argmax
    below), inherent to Sennrich BPE — merge i+1's pair counts need merge
    i applied.  Measured throughput at ``batch_argmax=1`` (exact Sennrich)
    is **~2.5-4 merges/s and FLAT across corpus scale** (sf0.1 / 10x /
    100x: 4.0 / 3.8 / 2.5 merges/s at n_merges=50) because the per-merge
    work runs over the word-TYPE table, not the corpus — the cost is the
    fixed ~0.25-0.4s action round-trip, not data volume.  Extrapolated: a
    32k-merge vocab is ~2.5-3.5 HOURS of driver-serialized merges
    regardless of cluster size.

    ``batch_argmax=B`` (r13 verdict, Next #7) is the measured escape for
    the big-vocab regime: each round takes the top-B SYMBOL-DISJOINT pairs
    (greedy selection down the exact (count desc, a, b) order, skipping
    any pair sharing a symbol with an already-selected pair or its merged
    form) and applies them in one lineage chain — B merges per driver
    round trip.  Disjointness keeps every selected pair's count EXACT
    (merging (a,b) can only change counts of pairs touching a, b, or ab),
    so the deviation from exact Sennrich is ORDER-level only: a pair
    newly created mid-round (e.g. (prev, ab)) cannot win until the next
    round.  Twin-tested in tests/test_bpe.py (merge-set overlap + the
    exact-prefix property); measured ≥20 merges/s at B=8 (SCALE.md
    §Round-14 BPE batch escape).  ``batch_argmax=1`` is bit-identical to
    exact Sennrich and stays the default (and the driver-gated query's
    mode).
    """
    syms = word_counts(docs, text_col).select(
        "w", "cnt", _chars_with_eow(F.col("w")).alias("syms")
    )
    # LAZY checkpoint (r17): the first round's pair-count collect
    # materializes it — lineage cut identical, one fewer job (guide §1.2).
    syms = syms.localCheckpoint(eager=False)

    B = max(1, int(batch_argmax))
    merges: list[tuple[str, str]] = []
    merge_counts: list[int] = []
    applied = 0
    while len(merges) < n_merges:
        pairs = (
            syms.select("cnt", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
        )
        # Over-fetch 8x candidates so greedy disjoint selection can skip
        # conflicting pairs and still fill the batch; B=1 keeps the exact
        # TakeOrdered(1) plan.
        cand = (
            pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(B if B == 1 else B * 8)
            .collect()
        )
        # limit(n).collect() returns the top-n SET but not necessarily in
        # sort order (observed under AQE) — re-sort driver-side; the list
        # is B*8 rows, trivial.
        cand.sort(key=lambda r: (-r["n"], r["a"], r["b"]))
        selected: list[tuple[str, str, int]] = []
        used: set[str] = set()
        room = min(B, n_merges - len(merges))
        for r in cand:
            if r["n"] < min_pair_count:
                break
            a, b = r["a"], r["b"]
            if a in used or b in used or (a + b) in used:
                continue  # shares a symbol with a selected merge: next round
            selected.append((a, b, int(r["n"])))
            used.update((a, b, a + b))
            if len(selected) >= room:
                break
        if not selected:
            break
        for a, b, won in selected:
            merges.append((a, b))
            merge_counts.append(won)
        # One fold applies the whole disjoint batch (see _apply_merges);
        # checkpoint cadence counts FOLDS, so lineage depth stays the same
        # as exact mode regardless of B.
        syms = syms.select(
            "w",
            "cnt",
            _apply_merges(F.col("syms"), [(a, b) for a, b, _ in selected]).alias(
                "syms"
            ),
        )
        applied += 1
        if applied % _CHECKPOINT_EVERY == 0:
            # lazy: the next round's pair-count collect materializes it
            syms = syms.localCheckpoint(eager=False)

    word_pieces = syms.select("w", "cnt", F.col("syms").alias("pieces"))
    # lazy: the vocab collect below materializes it; later consumers
    # (callers reading word_pieces from the returned dict) reuse the cache
    word_pieces = word_pieces.localCheckpoint(eager=False)
    vocab_rows = (
        word_pieces.select(F.explode("pieces").alias("s")).distinct().collect()
    )
    return {
        "merges": merges,
        "merge_counts": merge_counts,
        "word_pieces": word_pieces,
        "vocab": sorted(r["s"] for r in vocab_rows),
    }


def _segment_word_python(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Driver/UDF twin of the training fold: apply the learned merges in
    order to one word.  Used for OOV words at tokenization time."""
    syms = list(word) + [EOW]
    for a, b in merges:
        out: list[str] = []
        pend: str | None = None
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
        syms = out
    return syms


def bpe_tokenize(
    docs: DataFrame, model: dict, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_words, n_pieces, pieces) — corpus tokenized under the
    trained BPE model.

    Known words (the entire training vocabulary) resolve through a
    word→pieces join — pure JVM; the join strategy is left to AQE, which
    broadcasts the pieces table whenever it fits the threshold (asserted
    at test scale) and falls back to a hash join when the vocabulary is
    genuinely large (10^7-10^8 words at web scale — a FORCED broadcast
    there is a guaranteed executor OOM, which is why there is no
    ``F.broadcast`` hint on either join).  OOV words replay the merge
    list in an Arrow-batched ``pandas_udf`` over the DISTINCT OOV words
    only (deduplicated before the Python boundary), then ride the same
    join path.  Piece order within a document follows word order
    (explode preserves it via the position index).
    """
    from pyspark.sql.functions import pandas_udf

    merges = model["merges"]

    wp = model["word_pieces"].select("w", "pieces")

    words = docs.select(
        "doc_id", F.posexplode(tokens(text_col)).alias("pos", "w")
    )
    known = words.join(wp, "w", "left")

    oov_words = known.filter(F.col("pieces").isNull()).select("w").distinct()

    @pandas_udf("array<string>")
    def segment_oov(ws: pd.Series) -> pd.Series:
        return ws.map(lambda w: _segment_word_python(w, merges))

    oov_pieces = oov_words.select(
        "w", segment_oov(F.col("w")).alias("oov_pieces")
    )
    resolved = known.join(oov_pieces, "w", "left").select(
        "doc_id",
        "pos",
        F.coalesce("pieces", "oov_pieces").alias("pieces"),
    )
    return resolved.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum(F.size("pieces")).alias("n_pieces"),
        F.flatten(F.array_sort(F.collect_list(F.struct("pos", "pieces"))).pieces).alias(
            "pieces"
        ),
    )


def bpe_encode_ids(
    docs: DataFrame, model: dict, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_ids, ids array<int>) — the corpus as integer BPE piece
    ids, the input shape :func:`operators.packing.pack_fixed_blocks`
    slices into training blocks.

    The id space is deterministic: the trained model's sorted vocabulary
    maps to ids 0..V-1 (a pure function of the corpus, like the merge
    list), and pieces outside it — possible only for OOV segmentations
    that produce characters unseen in training — take the reserved id V
    (the <unk> convention).  Pieces resolve through a broadcast
    piece→id join; order is restored via the position index.

    Every input document gets a row — token-less documents (empty or
    whitespace-only text) come back with ``n_ids=0, ids=[]`` via a left
    join back to the doc-id universe (ADVICE r7: ``posexplode`` of an
    empty piece array yields no rows, which silently dropped those
    documents' end-of-document sentinels from the packed token stream,
    diverging from ``pack_fixed_blocks``' contract that empty documents
    contribute their eod).
    """
    vocab = model["vocab"]
    spark = docs.sparkSession
    from vector_graph_rag_spark.functions.literals import inline_rows

    vmap = inline_rows(
        spark,
        [(p, i) for i, p in enumerate(vocab)] or [("", -1)],
        "piece string, pid int",
    )
    pieces = bpe_tokenize(docs, model, text_col).select(
        "doc_id", F.posexplode("pieces").alias("pos", "piece")
    )
    unk = len(vocab)
    encoded = (
        pieces.join(F.broadcast(vmap), "piece", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ids"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "pos", F.coalesce("pid", F.lit(unk)).alias("pid")
                    )
                )
            ).pid.alias("ids"),
        )
    )
    return docs.select("doc_id").join(encoded, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_ids", F.lit(0).cast("long")).alias("n_ids"),
        F.coalesce("ids", F.array().cast("array<int>")).alias("ids"),
    )


def bpe_token_stats(docs: DataFrame, model: dict, text_col: str = "text") -> DataFrame:
    """One-row corpus statistics under the trained tokenizer: total words,
    total BPE pieces, pieces/word, chars/piece (compression) — the token
    accounting a data pipeline reports per shard."""
    tok = bpe_tokenize(docs, model, text_col)
    chars = docs.select(
        "doc_id", F.length(F.col(text_col)).alias("n_chars")
    )
    return (
        tok.join(chars, "doc_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_pieces").alias("total_pieces"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            "n_docs",
            "total_words",
            "total_pieces",
            (F.col("total_pieces") / F.col("total_words")).alias("pieces_per_word"),
            (F.col("total_chars") / F.col("total_pieces")).alias("chars_per_piece"),
        )
    )
