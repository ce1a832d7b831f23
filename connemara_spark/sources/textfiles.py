"""Raw document ingestion: JSONL / CSV landing files → typed document rows.

Crawler and vendor drops arrive as line-delimited JSON or CSV, not parquet.
These readers enforce the documents schema up front (no sampling-based
inference jobs at 100 TB), quarantine corrupt lines instead of failing the
load, and report a per-load quality summary — the boring-but-essential edge
of a training-data pipeline.

Scale notes: schema is explicit so the JSON/CSV parsers run single-pass in
PERMISSIVE mode; corrupt rows carry their raw line in ``_corrupt_record``
(quarantined to a side output, never silently dropped); text files split by
line ranges so a directory of large .jsonl files parallelizes by
``maxPartitionBytes`` like any other scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def read_jsonl_docs(
    spark: SparkSession, path: str, *, schema: T.StructType = DOC_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON documents. Returns ``(good, quarantine)``:
    rows failing the schema land in quarantine with the offending raw line.

    Cache lifetime: the parsed load stays cached for the session (both
    outputs read it). Long-lived drivers ingesting many drops should write
    the splits out and then ``spark.catalog.clearCache()`` — or stage the
    parsed load to a table, which is the cluster-scale recipe anyway.
    """
    full = T.StructType(list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Spark requires the parsed result to be materialized before any filter
    # that references only _corrupt_record (SPARK-21610): cache the single
    # parse so good/quarantine split it without re-reading. At cluster scale
    # use persist(DISK_ONLY) or stage the parsed load to a table first.
    df = df.cache()
    # PERMISSIVE quirk: a corrupt line yields nulls + the raw line in
    # _corrupt_record; a valid line has _corrupt_record null.
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, bad


def read_csv_docs(
    spark: SparkSession, path: str, *, schema: T.StructType = DOC_SCHEMA, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Read CSV documents with the same quarantine contract as JSONL."""
    full = T.StructType(list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
        .option("multiLine", "false")
        .csv(path)
    )
    df = df.cache()  # same SPARK-21610 materialization as read_jsonl_docs
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, bad


def load_summary(good: DataFrame, bad: DataFrame) -> DataFrame:
    """One-row load report: accepted / quarantined counts + null-text rate."""
    g = good.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("n_null_text"),
    )
    b = bad.agg(F.count(F.lit(1)).alias("n_quarantined"))
    return g.crossJoin(b)


def write_corpus(
    df: DataFrame,
    path: str,
    *,
    partition_by: str | None = "lang",
    zorder: tuple[str, str] | None = None,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Write a curated corpus: hive-partitioned by a low-cardinality column
    (per-language reads prune whole directories), optionally Z-ordered
    within partitions for two-dimensional pruning, zstd-compressed parquet.
    """
    if zorder is not None:
        from connemara_spark.operators.layout import zorder_layout

        x, y = zorder
        df = zorder_layout(df, x, y)
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)


def write_corpus_orc(
    df: DataFrame,
    path: str,
    *,
    partition_by: str | None = "lang",
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """ORC variant of ``write_corpus`` for consumers standardized on the
    ORC stack (Hive/Trino warehouses): same hive partitioning and zstd;
    ORC's min/max/bloom stripe indexes give the same footer-pruning story
    as parquet row groups."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.orc(path)


def read_orc_docs(spark, path: str) -> DataFrame:
    """Explicit-schema ORC reader (same no-inference contract as the JSONL/
    CSV readers: a schema drift fails loudly instead of sampling its way
    into a wrong plan)."""
    return spark.read.schema(DOC_SCHEMA).orc(path)
