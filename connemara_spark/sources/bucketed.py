"""Bucketed parquet tables: co-located joins and aggregations with ZERO
shuffle.

At 100 TB the dominant cost of a repeated join (CDC apply batches against
the store, corpus joins against per-doc metadata) is re-shuffling both
sides on the key every run. Spark bucketing amortizes that: write each
side ``bucketBy(n, key)`` once, and every subsequent equi-join or groupBy
on the key reads co-located buckets — the physical plan has no Exchange on
either side (``tests/test_bucketed.py`` asserts exactly that).

Guidance encoded here:
- Bucket counts must MATCH on both sides (or divide evenly) for the
  bucket-join to kick in; pick a power of two sized so one bucket of the
  big table ≈ one task's memory (~128-256 MB).
- ``sortBy`` the same key inside buckets: sort-merge joins then skip the
  per-task sort too.
- Bucketing metadata lives in the session catalog (``saveAsTable``);
  ``path=`` makes the table external so the parquet files live where the
  pipeline owns them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed parquet table registered as ``table``.
    One full shuffle now (hash-distributing rows into buckets) buys every
    later key-join/agg its shuffle back."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (``spark.table``;
    a bare ``spark.read.parquet`` of the same files would silently drop
    bucketing and reintroduce the shuffle)."""
    return spark.table(table)
