"""Cross-engine deterministic 60-bit hashing.

Spark's ``xxhash64`` and DuckDB's ``hash`` are different algorithms, so for
oracle-checkable hashing operators (minhash, simhash, LSH buckets, rolling
fingerprints) we derive a 60-bit integer from md5, which both engines
implement identically:

    Spark : CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)

15 hex chars = 60 bits → always a non-negative BIGINT in both engines.

``seeded_hash60`` gives k independent hash functions via the standard
universal-hash trick h_i(x) = (a_i * h(x) + b_i) mod p with a large prime —
used for minhash signatures.  All arithmetic stays in [0, 2^61) so BIGINT
never overflows (a_i, b_i < 2^30; h(x) < 2^60 → product < 2^90 would
overflow, so we first reduce h(x) mod p < 2^31 and keep everything < 2^63).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: classic universal-hash modulus.
MERSENNE_P = 2_147_483_647

# Deterministic (a, b) parameter streams — generated once from a fixed seed
# (python -c "import random; random.seed(42); ..."), frozen here as literals
# so the Spark and DuckDB sides can never drift.
# random.seed(42); a_i = randrange(1, 2**30) ×32, then b_i = randrange(0, 2**31-1) ×32
_A_PARAMS = [
    686579304, 119540832, 26855093, 796233791, 295310486, 262950629,
    239670712, 149827707, 790779947, 110053354, 726600540, 795285933,
    957970517, 585582862, 93349857, 634036507, 453035111, 34126397,
    31994524, 100604503, 234760739, 249817735, 542621109, 646412690,
    28492781, 602632298, 213500299, 768820205, 697808099, 753041956,
    585126462, 450455978,
]
_B_PARAMS = [
    473392624, 964669077, 1265438422, 597409992, 1738238661, 1866808229,
    13955983, 1629526405, 1730483678, 342865762, 1499242941, 907557512,
    730682427, 596724164, 333889688, 462382781, 2055599409, 1639591159,
    722831292, 219494902, 199170184, 815887678, 207696843, 770902343,
    1819980297, 738639288, 1296491777, 568054227, 1733294783, 93309105,
    1567087080, 986607411,
]


def hash60(col: Column | str) -> Column:
    """Deterministic 60-bit md5-derived hash, identical in Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash60_sql(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`hash60`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def hash60b(col: Column | str) -> Column:
    """Second independent 60-bit hash: md5 hex chars 16-30 (disjoint from
    :func:`hash60`'s 1-15).  The md5 halves are statistically independent,
    so (hash60, hash60b) is a 120-bit identity — the Kirsch-Mitzenmacher
    (h1, h2) pair the Bloom filter derives its k probe positions from
    (ADVICE r6: k positions from ONE reduced base share a collision floor;
    two independent bases push the full-vector collision space to
    m*(m-1)).  Catalyst's subexpression elimination computes the md5 once
    when both hashes appear in one projection."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 16, 15), 16, 10).cast("bigint")


def hash60b_sql(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`hash60b`."""
    return f"CAST(('0x' || substr(md5({expr}), 16, 15)) AS BIGINT)"


def seeded_hash60(col: Column | str, i: int) -> Column:
    """i-th universal hash of the md5 base hash, in [0, MERSENNE_P)."""
    return seeded_hash60_from_base(hash60(col) % F.lit(MERSENNE_P), i)


def seeded_hash60_from_base(base: Column, i: int) -> Column:
    """i-th universal hash given the pre-reduced base (= hash60(x) % P).

    Computing the md5 base ONCE and deriving the k seeded hashes from it is
    the k× cheaper form for signature builders (minhash computes 16-32 of
    these per shingle — one md5 instead of 16-32).
    """
    a, b = _A_PARAMS[i], _B_PARAMS[i]
    return (F.lit(a) * base + F.lit(b)) % F.lit(MERSENNE_P)


def seeded_hash60_sql(expr: str, i: int) -> str:
    """DuckDB SQL text matching :func:`seeded_hash60`."""
    a, b = _A_PARAMS[i], _B_PARAMS[i]
    return f"(({a} * ({hash60_sql(expr)} % {MERSENNE_P}) + {b}) % {MERSENNE_P})"


def num_hashes() -> int:
    return len(_A_PARAMS)
