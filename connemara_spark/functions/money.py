"""Cross-engine-exact money arithmetic.

A double->DECIMAL cast is ENGINE-DIVERGENT on near-tie shortest reprs:
Spark (java BigDecimal.valueOf) rounds the double's shortest decimal
string HALF_UP, while DuckDB rounds at ~15 significant digits, so e.g.
``1.7249999999999999`` casts to ``1.72`` in Spark and ``1.73`` in DuckDB
(measured: 48/400 adversarial values diverge; the round-9 driver red
rows). ``ROUND(double, n)`` diverges the same way at half-grid values.

The exact alternative: snap the double onto the 10^-scale grid with
``FLOOR(x * 10^s + 0.5)`` — multiply, add, floor are IEEE-754 operations
with bit-identical results in every engine — and only THEN cast, which
is exact for an on-grid double (an integer divided by 10^s round-trips
through its own shortest repr). The snap is round-half-toward-positive-
infinity, applied consistently on both sides of any gate.

SQL twin (DuckDB/ANSI):
``CAST(CAST(FLOOR(x * 100 + 0.5) AS DOUBLE) / 100 AS DECIMAL(12,2))``.

Scope: |x| * 10^s must stay below 2^53 (exact-integer doubles) — fine
for money; not a generic decimal library.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def grid_cents(col: Column | str, scale: int = 2) -> Column:
    """``FLOOR(x * 10^scale + 0.5)`` as BIGINT — the exact integer grid
    unit (cents for scale=2). Deterministic across engines; NULL-safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(float(10**scale)) + F.lit(0.5))


def grid_double(col: Column | str, scale: int = 2) -> Column:
    """The double snapped onto the 10^-scale grid (cents / 10^scale).
    Each on-grid double has a <= ``scale``-decimal shortest repr, so a
    subsequent DECIMAL cast is exact in both engines."""
    return grid_cents(col, scale).cast("double") / F.lit(float(10**scale))


def grid_dec(col: Column | str, dec_type: str = "decimal(12,2)") -> Column:
    """Grid-exact DECIMAL: snap, then the (now exact) cast. The scale is
    taken from ``dec_type``."""
    scale = int(dec_type.rstrip(")").split(",")[1])
    return grid_double(col, scale).cast(dec_type)


def grid_dec_sql(expr: str, dec_type: str = "DECIMAL(12,2)") -> str:
    """The SQL twin of ``grid_dec`` for oracle strings."""
    scale = int(dec_type.rstrip(")").split(",")[1])
    m = 10**scale
    return f"CAST(CAST(FLOOR(({expr}) * {m} + 0.5) AS DOUBLE) / {m} AS {dec_type})"
