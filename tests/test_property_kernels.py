"""Hypothesis property tests over the pure-Python kernels.

These kernels run inside Arrow-batched UDFs (chunker) or on the driver
(rerank parsing, normalization twins); their invariants are cheap to check
over generated inputs because no Spark job is involved.  The Spark-side
wiring of each kernel is pinned separately (oracle queries / unit tests).
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from vector_graph_rag_spark.functions.text import normalize_phrase_str
from vector_graph_rag_spark.llm.rerank import parse_rerank_response
from vector_graph_rag_spark.sources.loaders import DEFAULT_SEPARATORS, chunk_text

# --- chunker ----------------------------------------------------------------

_text = st.text(
    alphabet=st.sampled_from(list("ab \n.") + ["x"]), min_size=0, max_size=400
)


@settings(max_examples=300, deadline=None)
@given(
    text=_text,
    chunk_size=st.integers(min_value=8, max_value=60),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_text_invariants(text, chunk_size, overlap_frac):
    overlap = int(chunk_size * overlap_frac)
    chunks = chunk_text(text, chunk_size=chunk_size, chunk_overlap=overlap)
    if len(text) <= chunk_size:
        assert chunks == [text]
        return
    # every chunk is bounded, non-empty, and a substring of the input
    assert chunks
    for c in chunks:
        assert 0 < len(c) <= chunk_size
        assert c in text
    # chunks occur in order: each can be located at a strictly increasing
    # start position (overlapping windows step forward by < chunk_size)
    pos = -1
    for c in chunks:
        found = text.find(c, pos + 1)
        assert found > pos
        pos = found


@settings(max_examples=300, deadline=None)
@given(
    body=st.text(alphabet="abcdef", min_size=1, max_size=400),
    chunk_size=st.integers(min_value=8, max_value=60),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_text_window_fallback_reconstructs_exactly(
    body, chunk_size, overlap_frac
):
    """No separator present → character windows; stitching each window's
    unique prefix back together must reproduce the input byte-for-byte."""
    for s in DEFAULT_SEPARATORS:
        assert s not in body
    overlap = int(chunk_size * overlap_frac)
    step = chunk_size - overlap
    chunks = chunk_text(body, chunk_size=chunk_size, chunk_overlap=overlap)
    if len(body) <= chunk_size:
        assert chunks == [body]
        return
    assert "".join(c[:step] for c in chunks[:-1]) + chunks[-1] == body


@settings(max_examples=300, deadline=None)
@given(
    parts=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=50), min_size=1, max_size=20
    ),
    chunk_size=st.integers(min_value=8, max_value=40),
)
def test_chunk_text_separator_path_loses_no_part(parts, chunk_size):
    """Splitting on the chosen separator and chunking must keep every
    separator-delimited part's characters (separators at chunk boundaries
    may drop, content may not)."""
    text = "\n\n".join(parts)
    chunks = chunk_text(text, chunk_size=chunk_size, chunk_overlap=0)
    step = chunk_size  # overlap 0
    joined = "".join(chunks)
    # character content is preserved up to boundary separators and window
    # overlap duplication (overlap=0 ⇒ duplication only from oversized-part
    # windows, which don't duplicate at step == chunk_size)
    for ch in "abc":
        assert joined.count(ch) == text.count(ch)
    # order preserved: non-sep characters read out in the same sequence
    strip = lambda s: s.replace("\n", "")
    assert strip(joined) == strip(text)


# --- phrase normalization ---------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(s=st.text(min_size=0, max_size=120))
def test_normalize_phrase_str_properties(s):
    out = normalize_phrase_str(s)
    # idempotent, lowercase, restricted alphabet, space-trimmed
    allowed = set("abcdefghijklmnopqrstuvwxyz0123456789 ")
    assert normalize_phrase_str(out) == out
    assert set(out) <= allowed
    assert not out.startswith(" ") and not out.endswith(" ")
    # ASCII-alnum content preserved in order (kernel lowercases FIRST, then
    # the ASCII regex maps everything else — incl. Unicode digits like '¹' —
    # to spaces; never deletes in a way that merges tokens)
    alnum = [c for c in s.lower() if c in allowed and c != " "]
    assert [c for c in out if c != " "] == alnum


# --- rerank response parsing ------------------------------------------------

_IDS = st.lists(
    st.text(alphabet="0123456789abcdef", min_size=4, max_size=8),
    min_size=1,
    max_size=6,
    unique=True,
)


@settings(max_examples=300, deadline=None)
@given(
    ids=_IDS,
    picks=st.lists(st.integers(min_value=0, max_value=5), max_size=8),
    hallucinate=st.booleans(),
    garbage=st.booleans(),
)
def test_parse_rerank_response_properties(ids, picks, hallucinate, garbage):
    texts = [f"s{i} rel t{i}" for i in range(len(ids))]
    if garbage:
        assert parse_rerank_response("{not json", ids, texts) == []
        assert parse_rerank_response('{"useful_relations": 3}', ids, texts) == []
        return
    lines = []
    expected = []
    for p in picks:
        i = p % len(ids)
        if hallucinate:
            # wrong bracketed id, exact text → repaired to the true id
            lines.append(f"[deadbeefbad] {texts[i]}")
        else:
            lines.append(f"[{ids[i]}] {texts[i]}")
        if ids[i] not in expected:
            expected.append(ids[i])
    got = parse_rerank_response(
        json.dumps({"useful_relations": lines}), ids, texts
    )
    assert got == expected
    # always: subset of candidates, no duplicates
    assert len(set(got)) == len(got)
    assert set(got) <= set(ids)
