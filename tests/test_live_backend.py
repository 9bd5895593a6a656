"""Opt-in LIVE real-backend e2e (r15 verdict, Next #7).

The loopback tests (tests/test_prompts.py) prove the OpenAI-compat
protocol — request assembly, auth, retry, parse, cache write-back — with
zero network.  This module runs the SAME classes against a real
endpoint the moment one exists: set ``VGR_OPENAI_BASE_URL`` (and
optionally ``VGR_OPENAI_API_KEY``, ``VGR_OPENAI_MODEL``,
``VGR_OPENAI_EMBED_MODEL``, ``VGR_OPENAI_EMBED_DIM``) and the whole
file runs; unset, every test skips.  With a live endpoint the
remaining gap to the reference's 87.8% Recall@5 baseline (BASELINE.md)
is model quality, not code — these tests assert the structural
contract a real model must satisfy (non-empty responses, correct
embedding shape and normalization, zero-vector blank guard, all-hit
cache replay), never exact strings a live model cannot promise.

Reference live paths exercised: embeddings.py:206-323 (embed),
extractor.py:316-362 (query NER), reranker.py:152-191 (rerank),
reranker.py:357-366 (answer) — all through `llm_map_operator` /
`embed_with_backend`, the same operators the mock-backed driver
queries use.
"""

from __future__ import annotations

import math
import os

import pytest

LIVE_BASE_URL = os.environ.get("VGR_OPENAI_BASE_URL")

pytestmark = pytest.mark.skipif(
    not LIVE_BASE_URL,
    reason="VGR_OPENAI_BASE_URL not set — live-backend e2e is opt-in",
)


def _runner():
    from vector_graph_rag_spark.llm.runner import OpenAICompatRunner

    return OpenAICompatRunner(
        model=os.environ.get("VGR_OPENAI_MODEL", "gpt-4o-mini"),
        base_url=LIVE_BASE_URL,
        api_key=os.environ.get("VGR_OPENAI_API_KEY"),
    )


def _embedder():
    from vector_graph_rag_spark.functions.embedding import OpenAICompatEmbedder

    return OpenAICompatEmbedder(
        model=os.environ.get("VGR_OPENAI_EMBED_MODEL", "text-embedding-3-small"),
        dim=int(os.environ.get("VGR_OPENAI_EMBED_DIM", "1536")),
        base_url=LIVE_BASE_URL,
        api_key=os.environ.get("VGR_OPENAI_API_KEY"),
    )


def test_live_embed_through_pandas_udf(spark):
    """embed_with_backend drives the real /embeddings endpoint through the
    Arrow-batched pandas UDF: every nonblank row comes back at the
    configured dimension and L2-normalized; blank rows hit the
    zero-vector guard WITHOUT a request (the short/ragged-response guard
    raises loudly if the server misbehaves)."""
    from vector_graph_rag_spark.functions.embedding import embed_with_backend

    enc = _embedder()
    df = spark.createDataFrame(
        [(1, "graphs connect entities"), (2, ""), (3, "vectors rank passages")],
        "id long, text string",
    ).coalesce(1)
    rows = {r.id: list(r.embedding) for r in embed_with_backend(
        df, "text", enc, dim=enc.dim
    ).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2] == [0.0] * enc.dim  # blank → zero vector, no request
    for rid in (1, 3):
        v = rows[rid]
        assert len(v) == enc.dim
        norm = math.sqrt(sum(x * x for x in v))
        assert abs(norm - 1.0) < 1e-3, f"row {rid} not L2-normalized: {norm}"
    # distinct texts must not embed identically
    assert rows[1] != rows[3]


def test_live_ner_rerank_answer_through_llm_map_operator(spark):
    """The reference's three query-time LLM calls — query NER, relation
    rerank, answer generation — through `llm_map_operator` against the
    live endpoint, using the reference's verbatim prompt assembly (the
    flat cache-key strings extractor.py/reranker.py key on).  Asserts:
    every call returns non-empty text; the rerank line-repair parser
    accepts the live output without raising; and a write-back replay is
    100% cache hits (the second pass never touches the endpoint)."""
    from pyspark.sql import functions as F

    from vector_graph_rag_spark.llm.prompts import (
        answer_cache_key,
        ner_cache_key,
        rerank_cache_key,
    )
    from vector_graph_rag_spark.llm.rerank import (
        format_relations,
        parse_rerank_response,
    )
    from vector_graph_rag_spark.llm.runner import llm_map_operator

    question = "Which magazine was started first, Arthur's Magazine or First for Women?"
    rel_ids = ["r1", "r2", "r3"]
    rel_texts = [
        "Arthur's Magazine started in 1844",
        "First for Women started in 1989",
        "Philadelphia is a city in Pennsylvania",
    ]
    passages = [
        "Arthur's Magazine (1844-1846) was an American literary periodical.",
        "First for Women is a woman's magazine launched in 1989.",
    ]
    prompts = [
        ("ner", ner_cache_key(question)),
        ("rerank", rerank_cache_key(question, format_relations(rel_ids, rel_texts))),
        ("answer", answer_cache_key(question, passages)),
    ]
    df = spark.createDataFrame(prompts, "kind string, prompt string").coalesce(1)

    first = {r.kind: r for r in llm_map_operator(df, "prompt", _runner()).collect()}
    assert set(first) == {"ner", "rerank", "answer"}
    for kind, row in first.items():
        assert row.response and row.response.strip(), f"{kind}: empty response"
        assert not row.from_cache
    # the rerank line-repair parser must accept live output without raising
    selected = parse_rerank_response(first["rerank"].response, rel_ids, rel_texts)
    assert isinstance(selected, list)
    assert all(s in rel_ids for s in selected)

    # write-back replay: all hits, zero live calls on the second pass
    cache = spark.createDataFrame(
        [(r.prompt, r.response) for r in first.values()],
        "prompt string, response string",
    ).select(F.md5("prompt").alias("prompt_md5"), "response")
    second = llm_map_operator(df, "prompt", _runner(), cache=cache).collect()
    assert all(r.from_cache for r in second)
    assert {r.kind: r.response for r in second} == {
        k: r.response for k, r in first.items()
    }
