"""Rerank response parsing + deterministic mock rerank.

Reference LLMReranker (reranker.py:95-296): relations are formatted as
"[id] text" lines, the model returns JSON {"useful_relations": ["[id] text",
...]}, exactly num_select=5 are requested (reranker.py:276), and
hallucinated ids are repaired by exact text match (`_correct_line`,
reranker.py:81-92).  There is no fallback fill (reranker.py:290): if the
model selects fewer/invalid lines, the result is just shorter.

`parse_rerank_response` replicates parse + repair; `mock_rerank` is the
deterministic stand-in used in correctness runs — it "selects" the first
num_select candidates in candidate order, which exercises the same ordered
head-limit semantics (rag.py:513-515) without a model.
"""

from __future__ import annotations

import json


def format_relations(relation_ids: list[str], relation_texts: list[str]) -> str:
    """"[id] text" lines (reranker.py:141-150)."""
    return "\n".join(f"[{rid}] {text}" for rid, text in zip(relation_ids, relation_texts))


def _repair_line(line: str, relation_ids: list[str], relation_texts: list[str]) -> str | None:
    """Hallucinated-id repair by exact text match (reranker.py:81-92)."""
    text = line[line.find("]") + 1 :].strip()
    for rid, rtext in zip(relation_ids, relation_texts):
        if rtext.strip() == text:
            return rid
    return None


def parse_rerank_response(
    response: str,
    relation_ids: list[str],
    relation_texts: list[str],
) -> list[str]:
    """JSON response → ordered valid relation-id list (reranker.py:200-250).

    - lines whose bracketed id is a valid candidate id pass through;
    - invalid ids fall back to exact-text repair;
    - unparseable JSON → [] (reranker.py:248-250);
    - duplicates keep first occurrence; no fallback fill.
    """
    try:
        data = json.loads(response)
        lines = data.get("useful_relations", [])
    except (json.JSONDecodeError, AttributeError):
        return []
    if not isinstance(lines, list):
        return []
    valid = set(relation_ids)
    out: list[str] = []
    for line in lines:
        if not isinstance(line, str):
            continue
        rid = None
        if line.startswith("[") and "]" in line:
            candidate = line[1 : line.find("]")]
            if candidate in valid:
                rid = candidate
        if rid is None:
            rid = _repair_line(line, relation_ids, relation_texts)
        if rid is not None and rid not in out:
            out.append(rid)
    return out


def mock_rerank(relation_ids: list[str], num_select: int = 5) -> list[str]:
    """Deterministic rerank stand-in: first num_select in candidate order
    (the no-rerank head-limit branch, rag.py:513-515)."""
    return list(relation_ids[:num_select])
