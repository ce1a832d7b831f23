"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB the dominant cost of a selective two-dimensional query (user ×
time, tenant × date, ...) is how many files its predicates prune. Linear
layouts cluster one dimension perfectly and scatter the other; interleaving
the key bits (Morton order) bounds BOTH dimensions' min/max ranges per file,
so parquet footer stats prune on either predicate — the same technique
Delta/Iceberg expose as OPTIMIZE ZORDER BY.

``morton_key`` is a pure per-row expression (zero shuffle);
``zorder_layout`` adds the one range-repartition + in-partition sort that
any clustering rewrite costs. Bit math is the portable ((x >> b) & 1) *
2^(2b) chain — identical in Spark SQL and any oracle engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key_sql(x: str, y: str, *, bits: int = 16, shift_fmt: str = "({c} >> {b})") -> str:
    """The interleave chain as SQL text. ``shift_fmt``: ``({c} >> {b})`` for
    engines with shift operators (DuckDB, Spark SQL 4), or
    ``shiftright({c}, {b})`` function style. Disjoint bits sum with ``+``
    (equal to OR, left-associative, exact in BIGINT)."""
    terms = []
    for b in range(bits):
        sx = shift_fmt.format(c=x, b=b)
        sy = shift_fmt.format(c=y, b=b)
        terms.append(f"({sx} & 1) * {1 << (2 * b)}")
        terms.append(f"({sy} & 1) * {1 << (2 * b + 1)}")
    return " + ".join(terms)


def morton_key(x: Column | str, y: Column | str, *, bits: int = 16) -> Column:
    """Morton (Z-order) key of two non-negative ints with ``bits`` bits each
    — native Catalyst bit ops, whole-stage codegen'd."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    # bigint cast is load-bearing: shiftleft on an int column masks the
    # shift distance mod 32, silently corrupting keys for bits >= 16
    out = F.lit(0).cast("bigint")
    for b in range(bits):
        out = out + F.shiftleft(F.shiftright(xc, b).bitwiseAND(F.lit(1)), 2 * b)
        out = out + F.shiftleft(F.shiftright(yc, b).bitwiseAND(F.lit(1)), 2 * b + 1)
    return out


def zorder_layout(
    df: DataFrame,
    x: str,
    y: str,
    *,
    bits: int = 16,
    n_files: int | None = None,
) -> DataFrame:
    """Rewrite ``df`` into Z-order: range-partition on the Morton key (one
    shuffle — each output file covers a contiguous Z-range, i.e. a bounded
    rectangle union in (x, y) space) and sort within partitions so parquet
    row-group stats are tight. Write the result with any sink; downstream
    scans prune on either x or y predicates."""
    keyed = df.withColumn("__z", morton_key(x, y, bits=bits))
    parts = n_files or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
