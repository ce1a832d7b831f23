"""Capture the EXACT frame BucketStore._write_buckets hands to the parquet
writer — plans/r11/bucket_store_write_{before,after}.txt — by intercepting
DataFrameWriter.parquet during a real store.write() on the importable tree.

Usage: PYTHONPATH=<tree> python tools/r11_bucket_write_plan.py <before|after>

The r11 claim this pins: the pre-write repartition must carry an explicit
partition count (numPartitions == the bucket modulus) so AQE cannot
coalesce a small batch's shuffle into one serial file-writing task; the
"before" plan shows the count-less RepartitionByExpression, the "after"
shows it pinned.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after")
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans/r11"
    os.makedirs(out_dir, exist_ok=True)

    import tempfile

    import pyspark.sql.readwriter as rw

    from connemara_spark.catalog import ColumnSpec, TableSpec
    from connemara_spark.plans.inspect import formatted_plan
    from connemara_spark.session import get_spark
    from connemara_spark.stores import BucketStore

    spark = get_spark("r11-bucket-write-plan")
    spark.range(1).collect()

    spec = TableSpec(
        database="db1", schema="public", table="customer",
        columns=[ColumnSpec("c_custkey", "bigint"), ColumnSpec("c_name", "text")],
        pk_cols=["c_custkey"],
    )
    df = spark.range(1, 1001).selectExpr(
        "id as c_custkey", "concat('c#', id) as c_name"
    )

    captured: list = []

    class _Abort(Exception):
        pass

    orig = rw.DataFrameWriter.parquet

    def interceptor(self, path, **kw):
        captured.append(self._df)
        raise _Abort()

    root = tempfile.mkdtemp(prefix="r11_bwplan_")
    rw.DataFrameWriter.parquet = interceptor
    try:
        BucketStore(spark, root, n_buckets=32).write(spec, df)
    except _Abort:
        pass
    finally:
        rw.DataFrameWriter.parquet = orig

    assert captured, "writer interception captured no frame"
    path = os.path.join(out_dir, f"bucket_store_write_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(
            "frame handed to DataFrameWriter.parquet by "
            "stores.BucketStore._write_buckets (n_buckets=32), captured by "
            "writer interception during a real store.write():\n\n"
        )
        fh.write(formatted_plan(captured[0]))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
