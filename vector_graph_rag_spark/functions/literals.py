"""Fast construction of large constant arrays.

``F.lit(<nested python list>)`` converts element-by-element over py4j —
~2s for a 1000-int codebook, paid at PLAN BUILD time on the driver for
every query that embeds a broadcast constant (measured: the PQ codebook
literal).  Rendering the same constant as ONE SQL string and letting the
JVM parse it costs ~5ms and produces the identical expression tree
(CreateArray of foldable Literals, constant-folded once by Catalyst).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _render(v) -> str:
    if isinstance(v, (list, tuple)):
        return "array(" + ",".join(_render(x) for x in v) + ")"
    if isinstance(v, float):
        # repr is the shortest round-trip form; the DOUBLE cast parse is
        # correctly rounded, so the bits are preserved exactly
        return f"CAST('{v!r}' AS DOUBLE)"
    return str(int(v))


def num_array_lit(nested, dtype: str) -> Column:
    """A numeric array literal of any nesting depth as a single JVM-parsed
    expression.  Ints render as plain literals, floats as exact
    repr→DOUBLE casts.  ``dtype`` is the full SQL type, e.g.
    ``array<array<bigint>>`` — the cast pins element types so downstream
    arithmetic never mixes widths between engines."""
    return F.expr(f"CAST({_render(nested)} AS {dtype})")


# integer-only call sites predate the float support; same construction
int_array_lit = num_array_lit


def double_array_lit(vals) -> Column:
    """An array<double> literal as one JVM-parsed expression; values ride
    ``repr`` strings (shortest round-trip) cast to DOUBLE (correctly
    rounded), so the bits are preserved exactly."""
    body = ",".join(f"CAST('{v!r}' AS DOUBLE)" for v in vals)
    return F.expr(f"array({body})")


def int_double_map_lit(d: dict, key_type: str = "int") -> Column:
    """A map<int, double> literal as one JVM-parsed ``map_from_arrays``
    expression (``F.create_map(*[F.lit…])`` is 2 py4j calls per entry —
    ~1s of driver time per 512-weight classifier map, per use).  Double
    values ride ``repr`` strings cast to DOUBLE: Python's repr is the
    shortest round-trip form and Java's parse is correctly rounded, so
    the bits are preserved exactly."""
    keys = ",".join(str(int(k)) for k in d)
    vals = ",".join(f"CAST('{v!r}' AS DOUBLE)" for v in d.values())
    return F.expr(
        f"map_from_arrays(CAST(array({keys}) AS array<{key_type}>),"
        f" array({vals}))"
    )
