"""Declarative data-quality expectations — the constraint gate a
production pipeline runs before committing data (the role Deequ /
Great Expectations / Delta table constraints play).

Design: every constraint contributes one or more AGGREGATE EXPRESSIONS
and a driver-side predicate over the collected metrics.  ``validate``
evaluates ALL constraints in ONE ``df.agg(...)`` pass — a single
map-side-combined scan regardless of how many checks are attached, which
is the Spark-idiomatic shape (Deequ does exactly this); the only
exception is ``unique``, whose exact form needs a count-distinct (Spark
plans the mixed distinct/non-distinct aggregate with one Expand — still
one job) and whose ``approx=True`` form stays a plain HLL aggregate for
the 100 TB path.

Usage::

    from vector_graph_rag_spark.operators import expectations as X

    results = X.validate(df, [
        X.not_null("doc_id"),
        X.unique("doc_id"),
        X.in_range("score", 0.0, 1.0),
        X.matches("lang", "^[a-z]{2}$"),
        X.row_count_between(1, 10_000_000),
    ])
    X.enforce(df, checks)          # raises ExpectationError on failure

``sources/versioned.VersionedCorpus.write/merge`` accept ``checks=`` and
refuse to commit a version that violates them — the Delta ``ALTER TABLE
ADD CONSTRAINT`` behavior: a failed commit writes NOTHING (checked
before any file lands), so the store never holds a bad version.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    name: str
    metrics: dict[str, Column]  # alias -> aggregate expression
    # predicate over {alias: collected value} -> (ok, observed-description)
    evaluate: Callable[[dict], tuple[bool, str]]


@dataclass(frozen=True)
class CheckResult:
    name: str
    ok: bool
    observed: str


class ExpectationError(ValueError):
    def __init__(self, failures: list[CheckResult]):
        self.failures = failures
        super().__init__(
            "expectations failed: "
            + "; ".join(f"{f.name} ({f.observed})" for f in failures)
        )


def _violations(name: str, cond: Column) -> Constraint:
    alias = f"{name}__viol"
    return Constraint(
        name=name,
        metrics={alias: F.sum(F.when(cond, 1).otherwise(0))},
        evaluate=lambda m, a=alias: (
            (m[a] or 0) == 0,
            f"{m[a] or 0} violating rows",
        ),
    )


def not_null(col: str) -> Constraint:
    return _violations(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Constraint:
    c = F.col(col)
    return _violations(
        f"in_range({col}, {lo}, {hi})", c.isNull() | (c < lo) | (c > hi)
    )


def matches(col: str, regex: str) -> Constraint:
    c = F.col(col)
    return _violations(f"matches({col}, {regex})", c.isNull() | ~c.rlike(regex))


def unique(col: str, approx: bool = False) -> Constraint:
    """Exact by default (mixed distinct aggregate — one Expand, one job);
    ``approx=True`` uses HLL for the scale path (rsd ~2%: treat as a
    smoke alarm, not a proof)."""
    name = f"unique({col}{', approx' if approx else ''})"
    n, d = f"{name}__n", f"{name}__d"
    cnt = F.count(F.col(col))
    dis = (
        F.approx_count_distinct(col)
        if approx
        else F.count_distinct(F.col(col))
    )
    return Constraint(
        name=name,
        metrics={n: cnt, d: dis},
        evaluate=lambda m, n=n, d=d: (
            (m[n] or 0) == (m[d] or 0),
            f"{m[n] or 0} rows, {m[d] or 0} distinct",
        ),
    )


def row_count_between(lo: int, hi: int | None = None) -> Constraint:
    name = f"row_count_between({lo}, {hi})"
    a = f"{name}__n"
    return Constraint(
        name=name,
        metrics={a: F.count(F.lit(1))},
        evaluate=lambda m, a=a: (
            lo <= (m[a] or 0) and (hi is None or (m[a] or 0) <= hi),
            f"{m[a] or 0} rows",
        ),
    )


def mean_between(col: str, lo: float, hi: float) -> Constraint:
    name = f"mean_between({col}, {lo}, {hi})"
    a = f"{name}__m"
    return Constraint(
        name=name,
        metrics={a: F.avg(F.col(col))},
        evaluate=lambda m, a=a: (
            m[a] is not None and lo <= m[a] <= hi,
            f"mean={m[a]}",
        ),
    )


def validate(df: DataFrame, checks: list[Constraint]) -> list[CheckResult]:
    """Evaluate every constraint in ONE aggregation pass over ``df``."""
    if not checks:
        return []
    exprs = []
    for c in checks:
        for alias, expr in c.metrics.items():
            exprs.append(expr.alias(alias))
    row = df.agg(*exprs).collect()[0].asDict()
    out = []
    for c in checks:
        ok, observed = c.evaluate(row)
        out.append(CheckResult(name=c.name, ok=ok, observed=observed))
    return out


def enforce(df: DataFrame, checks: list[Constraint]) -> None:
    """Raise :class:`ExpectationError` listing every failing constraint."""
    failures = [r for r in validate(df, checks) if not r.ok]
    if failures:
        raise ExpectationError(failures)
