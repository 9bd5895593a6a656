"""Scalar text kernel — all JVM-side Column expressions (no Python UDFs).

Semantics replicated from the reference:

- ``normalize_phrase`` = ``processing_phrases`` at
  /root/reference/src/vector_graph_rag/llm/extractor.py:17-28:
  ``re.sub(r'[^A-Za-z0-9 ]', ' ', s.lower()).strip()``.
  Nuance (SURVEY §2 #15): Python ``.strip()`` removes only leading/trailing
  whitespace — internal runs of spaces are PRESERVED.  So we must use
  ``trim``, never ``regexp_replace(' +', ' ')``.

- deterministic ids: the reference uses UUID4 (builder.py:20-22), the only
  nondeterminism in its build path.  We derive ids as
  ``sha2(kind || ':' || normalized_key, 256)`` so every run (and the DuckDB
  oracle) produces identical ids.  Entity dedup key = normalized name
  (builder.py:76-85); relation dedup key = normalized "s p o" text
  (builder.py:97-109).

- ``relation_text`` = ``Triplet.to_relation_text()`` = ``"subj pred obj"``
  (models.py:38-42).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exactly the reference's character class (extractor.py:24).
_NORM_PATTERN = "[^A-Za-z0-9 ]"


def normalize_phrase(col: Column | str) -> Column:
    """Lowercase, non-alphanumerics→space, strip ends (extractor.py:17-28)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), _NORM_PATTERN, " "))


def _hash_id(kind: str, key: Column) -> Column:
    return F.sha2(F.concat(F.lit(kind + ":"), key), 256)


def entity_id(name_col: Column | str) -> Column:
    """Deterministic entity id keyed on normalized name (builder.py:76-85)."""
    return _hash_id("entity", normalize_phrase(name_col))


def relation_id(text_col: Column | str) -> Column:
    """Deterministic relation id keyed on normalized 's p o' (builder.py:97-109)."""
    return _hash_id("relation", normalize_phrase(text_col))


def passage_id(text_col: Column | str) -> Column:
    """Deterministic passage id keyed on raw text (reference keeps user ids or
    UUID4, rag.py:274-277; we hash the text for reproducibility)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _hash_id("passage", c)


def relation_text(subject: Column | str, predicate: Column | str, obj: Column | str) -> Column:
    """'subject predicate object' (models.py:38-42)."""
    s = F.col(subject) if isinstance(subject, str) else subject
    p = F.col(predicate) if isinstance(predicate, str) else predicate
    o = F.col(obj) if isinstance(obj, str) else obj
    return F.concat_ws(" ", s, p, o)


def normalize_phrase_str(s: str) -> str:
    """Driver-side Python twin of :func:`normalize_phrase` — for building
    lookup keys from request payloads (API seeds, test fixtures)."""
    import re

    # .strip(" ") not .strip(): Spark's trim removes spaces only.
    return re.sub(_NORM_PATTERN, " ", s.lower()).strip(" ")


def entity_id_str(name: str) -> str:
    """Driver-side Python twin of :func:`entity_id`."""
    import hashlib

    return hashlib.sha256(("entity:" + normalize_phrase_str(name)).encode()).hexdigest()


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization with empties removed — array<string>.

    Matches ``filter(len(x)>0 for x in s.split(' '))``; expressed with
    built-ins so it stays in whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda t: t != F.lit(""))
