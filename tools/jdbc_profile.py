"""Phase-level profile of the JDBC apply family (VERDICT r10 #4).

Replays cdc_jdbc_apply_customer's exact shape with a wall-clock timer
around every phase, splitting each batch's sink work into the DISTRIBUTED
staging write (Spark executors -> JDBC staging table) and the DRIVER
reconcile transaction (set-based replacement + ledger row), so the block's
cost attributes to either Spark work or Derby round-trips:

    python tools/jdbc_profile.py [sf_dir]

Prints one JSON line: {"phases": {...}, "total": s, "sf_dir": ...}.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from connemara_spark.catalog import (  # noqa: E402
    ColumnSpec,
    EngineCatalog,
    TableSpec,
)
from connemara_spark.pipeline import Replayer  # noqa: E402
from connemara_spark.queries import (  # noqa: E402
    CUSTOMER_SPEC,
    _customer_cdc_bronze,
    _event_lsn_bounds,
    load,
)
from connemara_spark.session import get_spark  # noqa: E402
from connemara_spark.sinks import JdbcApplySink  # noqa: E402
from connemara_spark.stores import BucketStore  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    spark = get_spark()
    phases: dict[str, float] = {}

    def clock(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        phases[name] = phases.get(name, 0.0) + time.perf_counter() - t0
        return out

    t_all = time.perf_counter()
    snapshot = load(spark, sf_dir, "customer")
    bronze = _customer_cdc_bronze(spark, sf_dir).persist()
    dbname = f"connemara_prof_{uuid.uuid4().hex}"
    url = f"jdbc:derby:memory:{dbname}"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    jvm = spark._jvm
    jvm.java.lang.Class.forName(props["driver"])

    def make_target():
        con = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
        con.createStatement().execute(
            "CREATE TABLE customer (c_custkey BIGINT PRIMARY KEY, "
            "c_name VARCHAR(128), c_nationkey INT, c_acctbal DOUBLE, "
            "c_mktsegment VARCHAR(64))"
        )
        con.close()

    clock("derby_create", make_target)
    root = tempfile.mkdtemp(prefix="connemara_jdbcprof_")
    try:
        spec = TableSpec(
            database=CUSTOMER_SPEC.database,
            schema=CUSTOMER_SPEC.schema,
            table=CUSTOMER_SPEC.table,
            columns=[ColumnSpec(c.name, c.pg_type) for c in CUSTOMER_SPEC.columns],
            pk_cols=list(CUSTOMER_SPEC.pk_cols),
        )
        store = BucketStore(spark, root, n_buckets=32)
        clock("seed_store_write", lambda: store.write(spec, snapshot))
        cat = EngineCatalog()
        cat.register(spec)
        rep = Replayer(spark, cat, store)
        sink = JdbcApplySink(
            spark, store, spec, url=url, target_table="customer",
            properties=props,
        )
        # split the sink's two legs: staging write (distributed) vs the
        # driver reconcile transaction — tool-local wrappers only
        stage0, rec0 = sink._stage_slice, sink._reconcile
        sink._stage_slice = lambda *a, **k: clock("sink_stage", lambda: stage0(*a, **k))
        sink._reconcile = lambda *a, **k: clock("sink_reconcile", lambda: rec0(*a, **k))
        clock("bootstrap_load", lambda: sink.bootstrap_load(batch_id="bootstrap"))
        lo, hi = _event_lsn_bounds(spark, sf_dir)
        step = max((hi - lo) // 2 + 1, 1)
        for i, b0 in enumerate(range(lo, hi + 1, step)):
            batch = bronze.filter(
                (F.col("lsn_start") >= b0) & (F.col("lsn_start") < b0 + step)
            )
            parsed = rep.parse_batch(batch).persist()
            try:
                summary = clock("batch_summary", lambda: rep._batch_summary(parsed))
                sink.before_apply(parsed)
                clock(
                    "store_apply",
                    lambda: rep.apply_batch(batch, events=parsed, summary=summary),
                )
                clock("sink_after_apply_total", lambda: sink.after_apply(
                    batch_id=f"batch-{i}"
                ))
            finally:
                parsed.unpersist()
        n = clock(
            "jdbc_readback",
            lambda: spark.read.jdbc(url, "customer", properties=props)
            .select(*[c.name for c in spec.columns])
            .count(),
        )
    finally:
        bronze.unpersist()
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    # after_apply wraps stage+reconcile; report its residue (touched-key
    # eval, python glue) separately so the three numbers don't double-count
    phases["sink_after_apply_glue"] = (
        phases.pop("sink_after_apply_total", 0.0)
        - phases.get("sink_stage", 0.0)
        - phases.get("sink_reconcile", 0.0)
    )
    print(json.dumps({
        "sf_dir": sf_dir,
        "rows": n,
        "total": round(time.perf_counter() - t_all, 3),
        "phases": {k: round(v, 3) for k, v in sorted(phases.items())},
    }))


if __name__ == "__main__":
    main()
