"""Curation operators on the reference's REAL 20-document corpus.

The oracle-parity tests exercise the curation family on synthetic word-soup
documents; real prose (punctuation, digits, quotes, mixed case — the
reference's actual evaluation passages) is where regex and tokenization
kernels break.  This writes the real corpus in the ``documents`` table
shape and runs the curation queries end-to-end on it, checking every
result against independent pure-Python twins of the kernels.
"""

from __future__ import annotations

import json
import re

import pytest

CORPUS = (
    "/root/reference/evaluation/data/"
    "openie_test_sample_results_ner_gpt-3.5-turbo-1106_20.json"
)


@pytest.fixture(scope="module")
def real_docs_dir(spark, tmp_path_factory):
    """The reference corpus written as a documents.parquet table dir."""
    with open(CORPUS) as f:
        docs = json.load(f)["docs"]
    rows = [
        (i, d["passage"], "en", f"src{i % 3}", len(d["passage"]))
        for i, d in enumerate(docs)
    ]
    out = tmp_path_factory.mktemp("real_corpus")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    return str(out)


def _toks(s: str) -> list[str]:
    return [t for t in s.split(" ") if t]


def test_repetition_filters_on_real_prose(spark, real_docs_dir):
    from vector_graph_rag_spark.queries.curation import repetition_quality_filters

    got = {
        r["doc_id"]: r for r in repetition_quality_filters(spark, real_docs_dir).collect()
    }
    with open(CORPUS) as f:
        docs = json.load(f)["docs"]
    assert len(got) == len(docs)
    for i, d in enumerate(docs):
        toks = _toks(d["passage"])
        from collections import Counter

        tc = Counter(toks)
        row = got[i]
        assert row["n_tokens"] == len(toks)
        assert row["n_distinct"] == len(tc)
        assert round(row["top_token_frac"], 6) == round(max(tc.values()) / len(toks), 6)
        bigrams = Counter(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
        if bigrams:
            assert round(row["top_bigram_frac"], 6) == round(
                max(bigrams.values()) / sum(bigrams.values()), 6
            )


def test_pii_redaction_counts_on_real_prose(spark, real_docs_dir):
    """Real prose contains digit runs, dotted abbreviations, and hyphens —
    the patterns must count exactly what the Python twin counts (the corpus
    itself contains no injected PII except what doc_id injects)."""
    from vector_graph_rag_spark.queries.curation import (
        _PII_EMAIL,
        _PII_IP,
        _PII_PHONE,
        pii_redaction_profile,
    )

    got = {r["doc_id"]: r for r in pii_redaction_profile(spark, real_docs_dir).collect()}
    with open(CORPUS) as f:
        docs = json.load(f)["docs"]
    for i, d in enumerate(docs):
        t = d["passage"]
        if i % 3 == 0:
            t += f" contact user{i}@example.com"
        if i % 5 == 0:
            t += f" call 555-{i % 10000:04d}"
        if i % 7 == 0:
            t += f" host 10.{i % 256}.0.{(i * 7) % 256}"
        assert got[i]["n_emails"] == len(re.findall(_PII_EMAIL, t)), i
        assert got[i]["n_phones"] == len(re.findall(_PII_PHONE, t)), i
        assert got[i]["n_ips"] == len(re.findall(_PII_IP, t)), i


def test_sequence_packing_on_real_prose(spark, real_docs_dir):
    from vector_graph_rag_spark.queries.curation import (
        _PACK_BUDGET,
        _PACK_SHARDS,
        sequence_packing,
    )

    rows = sequence_packing(spark, real_docs_dir).collect()
    with open(CORPUS) as f:
        docs = json.load(f)["docs"]
    assert {r["doc_id"] for r in rows} == set(range(len(docs)))
    for r in rows:
        assert r["shard"] == r["doc_id"] % _PACK_SHARDS
        assert r["n_tokens"] == len(_toks(docs[r["doc_id"]]["passage"]))
    # replay the greedy rule per shard
    by_shard: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        seq, fill = 0, None
        for r in shard_rows:
            if fill is None:
                fill = r["n_tokens"]
            elif fill + r["n_tokens"] <= _PACK_BUDGET:
                fill += r["n_tokens"]
            else:
                seq, fill = seq + 1, r["n_tokens"]
            assert r["seq_id"] == seq, r


def test_contamination_flags_real_duplicated_grams(spark, real_docs_dir):
    """The real corpus has no 5-gram overlap across distinct encyclopedia
    passages unless text is genuinely shared; verify the operator agrees
    with a brute-force Python twin on exactly which docs are flagged."""
    from vector_graph_rag_spark.queries.curation import (
        _DECON_MOD,
        _DECON_N,
        contamination_ngram_overlap,
    )

    got = {r["doc_id"]: r["n_shared_grams"] for r in
           contamination_ngram_overlap(spark, real_docs_dir).collect()}
    with open(CORPUS) as f:
        docs = json.load(f)["docs"]

    def grams(s):
        t = _toks(s)
        return {" ".join(t[i : i + _DECON_N]) for i in range(len(t) - _DECON_N + 1)}

    bench = set()
    for i, d in enumerate(docs):
        if i % _DECON_MOD == 0:
            bench |= grams(d["passage"])
    expect = {}
    for i, d in enumerate(docs):
        if i % _DECON_MOD == 0:
            continue
        n = len(grams(d["passage"]) & bench)
        if n >= 1:
            expect[i] = n
    assert got == expect