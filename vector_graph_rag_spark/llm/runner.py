"""Pluggable, cache-fronted, mockable model-call operator.

The reference makes four kinds of LLM calls — triplet extraction
(extractor.py:83-233), query NER (extractor.py:236-375), rerank
(reranker.py:95-296), answer generation (reranker.py:299-384) — each a
map-shaped string→string operation fronted by an MD5-keyed file cache
(cache.py:15-156).  Spark-native shape:

- ONE operator: `llm_map_operator(df, prompt_col, runner)` — an
  Arrow-batched `mapInPandas` that calls a pluggable `ModelRunner` per
  batch.  Batching amortizes HTTP round-trips exactly like the reference's
  batch_size=32 embed/insert batching (config.py:120-122).
- the cache is a TABLE: join inputs against the cache on prompt_md5;
  only misses reach the runner (anti-join), and new results are returned
  for write-back.  At 100 TB this turns "N LLM calls" into "N - hits",
  with the hit lookup a broadcast or shuffle join, never a driver loop.
- `MockModelRunner` makes the whole engine hermetic: deterministic
  fixture-table responses (FIXTURES.md §3.3) so every downstream operator
  is oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ModelRunner(Protocol):
    """Batch string→string model call. Implementations must be picklable
    (they ship to executors inside the mapInPandas closure)."""

    def run_batch(self, prompts: list[str]) -> list[str]: ...


class MockModelRunner:
    """Deterministic mock: response = lookup table else a derived echo."""

    def __init__(self, fixture: dict[str, str] | None = None, default_prefix: str = "mock:"):
        self.fixture = fixture or {}
        self.default_prefix = default_prefix

    def run_batch(self, prompts: list[str]) -> list[str]:
        return [
            self.fixture.get(p, f"{self.default_prefix}{p[:64]}") for p in prompts
        ]


class OpenAICompatRunner:
    """Real backend speaking the OpenAI-compatible chat-completions HTTP
    protocol (the reference's extractor.py/reranker.py calls, made through
    the openai client there).  The `openai` client package is preferred
    when importable (connection pooling, streaming); otherwise the
    protocol is spoken directly with stdlib urllib — same request
    assembly, bearer auth, and response parse — so the real-backend
    request/retry/parse paths are exercisable (and e2e-tested against a
    loopback server, tests/test_prompts.py) in containers without the
    client library or network access.  Transient failures (HTTP 429/5xx,
    connection errors) retry with exponential backoff; anything else
    raises.  Plain attributes only: instances pickle into the
    mapInPandas closure like every ModelRunner."""

    _RETRYABLE = (429, 500, 502, 503, 504)

    def __init__(
        self,
        model: str,
        base_url: str | None = None,
        api_key: str | None = None,
        temperature: float = 0.0,
        max_retries: int = 3,
        backoff_s: float = 0.25,
        timeout_s: float = 60.0,
        force_stdlib: bool = False,
    ):
        self.model, self.base_url, self.api_key = model, base_url, api_key
        self.temperature = temperature
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.timeout_s = timeout_s
        self.force_stdlib = force_stdlib

    def _request_body(self, prompt: str) -> dict:
        """The chat-completions request payload — one place, both paths."""
        return {
            "model": self.model,
            "temperature": self.temperature,
            "messages": [{"role": "user", "content": prompt}],
        }

    def _call_stdlib(self, prompt: str) -> str:
        import json
        import time
        import urllib.error
        import urllib.request

        url = (
            (self.base_url or "https://api.openai.com/v1").rstrip("/")
            + "/chat/completions"
        )
        body = json.dumps(self._request_body(prompt)).encode()
        for attempt in range(self.max_retries + 1):
            req = urllib.request.Request(
                url,
                data=body,
                headers={
                    "Content-Type": "application/json",
                    "Authorization": f"Bearer {self.api_key or ''}",
                },
                method="POST",
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    payload = json.load(resp)
                return payload["choices"][0]["message"]["content"] or ""
            except urllib.error.HTTPError as exc:
                if exc.code not in self._RETRYABLE or attempt >= self.max_retries:
                    raise
            except urllib.error.URLError:
                if attempt >= self.max_retries:
                    raise
            time.sleep(self.backoff_s * (2**attempt))
        raise RuntimeError("unreachable: retry loop exits by return or raise")

    def run_batch(self, prompts: list[str]) -> list[str]:
        if not self.force_stdlib:
            try:
                from openai import OpenAI  # type: ignore
            except ImportError:
                pass
            else:
                client = OpenAI(
                    base_url=self.base_url,
                    api_key=self.api_key,
                    max_retries=self.max_retries,
                )
                out = []
                for p in prompts:
                    resp = client.chat.completions.create(**self._request_body(p))
                    out.append(resp.choices[0].message.content or "")
                return out
        return [self._call_stdlib(p) for p in prompts]


def llm_map_operator(
    df: DataFrame,
    prompt_col: str,
    runner: ModelRunner,
    output_col: str = "response",
    cache: DataFrame | None = None,
) -> DataFrame:
    """df + prompt column → df + response column, cache-table-fronted.

    `cache` schema: (prompt_md5 string, response string).  Rows with a cache
    hit never reach the runner; the output carries `from_cache` so callers
    can write back `from_cache = false` rows (cache.py:110-124 write-back).
    """
    keyed = df.withColumn("__pmd5", F.md5(F.col(prompt_col)))
    if cache is not None:
        c = cache.select(
            F.col("prompt_md5").alias("__pmd5"),
            F.col("response").alias("__cached"),
        )
        keyed = keyed.join(F.broadcast(c), "__pmd5", "left")
    else:
        keyed = keyed.withColumn("__cached", F.lit(None).cast("string"))

    hits = keyed.filter(F.col("__cached").isNotNull())
    misses = keyed.filter(F.col("__cached").isNull())

    out_schema = ", ".join(
        f"`{name}` {dtype}" for name, dtype in misses.dtypes if name != "__cached"
    ) + f", `{output_col}` string"

    def _call(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            responses = runner.run_batch(list(pdf[prompt_col]))
            yield pdf.drop(columns=["__cached"]).assign(**{output_col: responses})

    called = misses.mapInPandas(_call, out_schema).withColumn(
        "from_cache", F.lit(False)
    )
    hit_rows = (
        hits.withColumn(output_col, F.col("__cached"))
        .drop("__cached")
        .withColumn("from_cache", F.lit(True))
    )
    return called.unionByName(hit_rows).drop("__pmd5")


def load_ner_cache_tsv(spark, path: str):
    """HippoRAG-format NER cache TSV → (question, entities array<string>).

    Reference ``_load_tsv_cache`` (llm/extractor.py:296-314): pandas
    read_csv(sep='\\t') + eval() of the ``triples`` column's
    ``{"named_entities": [...]}`` payload, entities then normalized with
    processing_phrases on lookup (extractor.py:334-337).  Spark-native twin:
    multiLine CSV scan (quoted fields span lines in the real files) +
    from_json — stays distributed, no driver-side eval().
    """
    from pyspark.sql import functions as F

    from vector_graph_rag_spark.functions.text import normalize_phrase

    df = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    qcol = "query" if "query" in df.columns else "question"
    parsed = F.from_json(F.col("triples"), "struct<named_entities:array<string>>")
    return (
        df.select(
            F.col(qcol).alias("question"),
            parsed.getField("named_entities").alias("raw_entities"),
        )
        .filter(F.col("raw_entities").isNotNull())
        .select(
            "question",
            F.transform("raw_entities", lambda e: normalize_phrase(e)).alias("entities"),
        )
    )
