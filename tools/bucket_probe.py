"""Measure BucketStore's partial-apply scaling claim on real data.

Claim (stores.py): batch IO is O(touched buckets), never O(table). This
probe loads lineitem at $SPARK_GRAFT_SF_DIR (default sf0.1, ~600k rows),
hosts it in a 64-bucket store, then times

  (a) a FULL rewrite (the ParquetStore behavior every batch would pay),
  (b) a partial apply whose touched keys fall into ONE bucket,
  (c) a partial apply touching ~8 buckets,

each patching the same column. Read IO is also reported via the pruned
path list. Run: python tools/bucket_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from pyspark.sql import functions as F

    from connemara_spark.catalog import ColumnSpec, TableSpec
    from connemara_spark.queries import load
    from connemara_spark.session import get_spark
    from connemara_spark.sources.snapshot import spark_schema_to_specs
    from connemara_spark.stores import BucketStore

    spark = get_spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = load(spark, sf_dir, "lineitem")
    spec = TableSpec(
        database="db1", schema="public", table="lineitem",
        columns=spark_schema_to_specs(li.schema),
        pk_cols=["l_orderkey", "l_linenumber"],
    )
    store = BucketStore(spark, tempfile.mkdtemp(prefix="bucket_probe_"), n_buckets=64)

    t0 = time.time()
    store.write(spec, li)
    t_seed = time.time() - t0
    n = li.count()

    def patch(df):
        return df.withColumn(
            "l_returnflag", F.concat(F.col("l_returnflag"), F.lit("!"))
        )

    # (a) full rewrite
    t0 = time.time()
    store.write(spec, patch(store.read(spec)))
    t_full = time.time() - t0

    # (b) one bucket: keys chosen BY bucket so the touched set is exactly 1
    one = store.read_buckets(spec, [3])
    t0 = time.time()
    store.write_partial(spec, patch(one), buckets=[3])
    t_one = time.time() - t0
    rows_one = one.count()

    # (c) eight buckets
    eight = list(range(8, 16))
    sl = store.read_buckets(spec, eight)
    t0 = time.time()
    store.write_partial(spec, patch(sl), buckets=eight)
    t_eight = time.time() - t0

    # read-side pruning witness: the keyed read lists only the touched dirs
    keys = li.select("l_orderkey", "l_linenumber").limit(1)
    pruned = store.read_for_keys(spec, keys)
    files = pruned.inputFiles()
    print(
        f'{{"table_rows": {n}, "seed_full_write_s": {t_seed:.2f}, '
        f'"full_rewrite_s": {t_full:.2f}, '
        f'"partial_1_of_64_s": {t_one:.2f}, "rows_in_bucket": {rows_one}, '
        f'"partial_8_of_64_s": {t_eight:.2f}, '
        f'"keyed_read_files": {len(files)}}}'
    )


if __name__ == "__main__":
    main()
