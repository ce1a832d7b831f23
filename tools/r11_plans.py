"""Capture .explain("formatted") for every query the r11 optimization
round touched, writing plans/r11/<query>_{before,after}.txt.

Usage:
    PYTHONPATH=<tree> python tools/r11_plans.py <before|after> [out_dir]

Run once with PYTHONPATH pointing at the pre-optimization worktree
(suffix "before") and once against the optimized repo (suffix "after").
The harness only uses APIs present in both trees; where a query's
meaningful plan is a PRE-WRITE sub-plan (maintainer patches, JDBC staged
slices, per-batch folds), it rebuilds the steady-state fixture exactly as
EXPLAIN.md's audits do and explains that frame. For the bounded stream
drains the captured text is the streaming frame's pre-start plan plus the
state width the drained checkpoint actually recorded (the offsets file
pins spark.sql.shuffle.partitions at query start).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile


def _explain(df) -> str:
    from connemara_spark.plans.inspect import formatted_plan

    return formatted_plan(df)


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after")
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans/r11"
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from pyspark.sql import functions as F

    from connemara_spark.session import get_spark

    spark = get_spark("r11-plans")
    spark.range(1).collect()

    def write(name: str, text: str) -> None:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")

    # ---- direct-return queries (the returned frame IS the plan) --------
    from connemara_spark.queries import REGISTRY

    for q in ("corpus_bpe_encode",):
        try:
            write(q, _explain(REGISTRY[q].fn(spark, sf_dir)))
        except Exception as exc:  # noqa: BLE001
            write(q, f"capture failed: {exc}")

    # ---- maintained views: steady-state patch frame --------------------
    from connemara_spark.catalog import ColumnSpec, EngineCatalog, TableSpec
    from connemara_spark.operators.ivm import (
        MaintainedAggView,
        MaintainedDistinctCountView,
        MaintainedMinMaxView,
        MaintainedTopKView,
        MaintainedTwoTableJoinView,
    )
    from connemara_spark.pipeline import ParquetStore, Replayer
    from connemara_spark.queries import (
        CUSTOMER_SPEC,
        _customer_cdc_bronze,
        _event_lsn_bounds,
        load,
    )

    def fresh_spec(base=CUSTOMER_SPEC):
        return TableSpec(
            database=base.database,
            schema=base.schema,
            table=base.table,
            columns=[ColumnSpec(c.name, c.pg_type) for c in base.columns],
            pk_cols=list(base.pk_cols),
        )

    def ivm_patch_plans():
        """Bootstrap + one steady batch for each single-table maintainer;
        explain the SECOND batch's patch frame (the steady-state shape)."""
        root = tempfile.mkdtemp(prefix="r11plans_ivm_")
        try:
            spec = fresh_spec()
            store = ParquetStore(spark, root)
            store.write(spec, load(spark, sf_dir, "customer"))
            cat = EngineCatalog()
            cat.register(spec)
            rep = Replayer(spark, cat, store)
            views = {
                "cdc_maintained_agg_view": MaintainedAggView(
                    spark, store, spec,
                    group_col="c_mktsegment", sum_col="c_acctbal",
                    sum_expr=(
                        "cast(cast(floor(c_acctbal * 100 + 0.5) as double)"
                        " / 100 as decimal(12,2))"
                    ),
                    sum_type="decimal(12,2)", view_dir=f"{root}/v_agg",
                ),
                "cdc_maintained_minmax_view": MaintainedMinMaxView(
                    spark, store, spec,
                    group_col="c_mktsegment", val_col="c_acctbal",
                    val_type="double", view_dir=f"{root}/v_mm",
                ),
                "cdc_maintained_distinct_view": MaintainedDistinctCountView(
                    spark, store, spec,
                    group_col="c_mktsegment", val_col="c_nationkey",
                    val_pg_type="integer", view_dir=f"{root}/v_dc",
                    support_buckets=16,
                ),
                "cdc_maintained_topk_view": MaintainedTopKView(
                    spark, store, spec,
                    group_col="c_mktsegment", val_col="c_acctbal",
                    k=5, slack=5, val_type="double", view_dir=f"{root}/v_tk",
                ),
            }
            bronze = _customer_cdc_bronze(spark, sf_dir)
            lo, hi = _event_lsn_bounds(spark, sf_dir)
            step = max((hi - lo) // 2 + 1, 1)
            parsed_all = rep.parse_batch(bronze).localCheckpoint()
            for i, b0 in enumerate(range(lo, hi + 1, step)):
                in_b = (F.col("lsn_start") >= b0) & (F.col("lsn_start") < b0 + step)
                parsed = parsed_all.filter(in_b)
                summary = rep._batch_summary(parsed)
                for v in views.values():
                    v.before_apply(parsed)
                rep.apply_batch(bronze.filter(in_b), events=parsed, summary=summary)
                if i == 0:
                    for v in views.values():
                        v.after_apply()
                else:
                    # steady state: explain the patch frame instead of
                    # writing it. Arity differs per maintainer (and per
                    # tree revision): the patched frame is element [1]
                    # everywhere (m/v0 first, extra support legs after).
                    for name, v in views.items():
                        patched = v._patch_frame()[1]
                        write(name, _explain(patched))
        finally:
            shutil.rmtree(root, ignore_errors=True)

    ivm_patch_plans()

    # ---- two-source join view: steady-state patch frame -----------------
    from connemara_spark.queries import ORDERS_CDC_SPEC, _orders_cdc_bronze
    from connemara_spark.stores import BucketStore

    def two_source_plan():
        root = tempfile.mkdtemp(prefix="r11plans_2src_")
        try:
            spec_a = TableSpec(
                database="db1", schema="public", table="customer",
                columns=[ColumnSpec(c.name, c.pg_type) for c in CUSTOMER_SPEC.columns],
                pk_cols=["c_custkey"],
            )
            spec_b = TableSpec(
                database="db2", schema="public", table="orders",
                columns=[ColumnSpec(c.name, c.pg_type) for c in ORDERS_CDC_SPEC.columns],
                pk_cols=["o_orderkey"],
            )
            store = BucketStore(spark, root, n_buckets=32)
            store.write(spec_a, load(spark, sf_dir, "customer"))
            store.write(
                spec_b,
                load(spark, sf_dir, "orders").select(
                    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
                ),
            )
            cat = EngineCatalog()
            cat.register(spec_a)
            cat.register(spec_b)
            rep = Replayer(
                spark, cat, store,
                allowed_slots=[("db1", "slot_db1"), ("db2", "slot_db2")],
            )
            view = MaintainedTwoTableJoinView(
                spark, store, spec_a, spec_b,
                key_a="c_custkey", key_b="o_orderkey",
                view_cols=[
                    "c_custkey", "c_name", "c_nationkey", "c_acctbal",
                    "c_mktsegment", "o_custkey", "o_orderstatus", "o_totalprice",
                ],
                view_dir=f"{root}/view",
            )
            bronze = (
                _customer_cdc_bronze(spark, sf_dir)
                .filter(F.col("lsn_start") % 2 == 0)
                .unionByName(
                    _orders_cdc_bronze(spark, sf_dir, database="db2", slot="slot_db2")
                )
            )
            lo, hi = _event_lsn_bounds(spark, sf_dir)
            step = max((hi - lo) // 2 + 1, 1)
            parsed_all = rep.parse_batch(bronze).localCheckpoint()
            for i, b0 in enumerate(range(lo, hi + 1, step)):
                in_b = (F.col("lsn_start") >= b0) & (F.col("lsn_start") < b0 + step)
                parsed = parsed_all.filter(in_b)
                summary = rep._batch_summary(parsed)
                view.before_apply(parsed)
                rep.apply_batch(bronze.filter(in_b), events=parsed, summary=summary)
                if i == 0:
                    view.after_apply()
                else:
                    write(
                        "cdc_two_source_join_view",
                        _explain(view._patch_frame()[1]),
                    )
        finally:
            shutil.rmtree(root, ignore_errors=True)

    two_source_plan()

    # ---- JDBC sink: the staged touched-key slice ------------------------
    def jdbc_plan():
        import uuid

        from connemara_spark.operators.ivm import touched_keys
        from connemara_spark.sinks import JdbcApplySink

        root = tempfile.mkdtemp(prefix="r11plans_jdbc_")
        url = f"jdbc:derby:memory:r11plans_{uuid.uuid4().hex}"
        props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
        jvm = spark._jvm
        jvm.java.lang.Class.forName(props["driver"])
        con = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
        con.createStatement().execute(
            "CREATE TABLE customer (c_custkey BIGINT PRIMARY KEY, "
            "c_name VARCHAR(128), c_nationkey INT, c_acctbal DOUBLE, "
            "c_mktsegment VARCHAR(64))"
        )
        con.close()
        try:
            spec = fresh_spec()
            store = BucketStore(spark, root, n_buckets=32)
            store.write(spec, load(spark, sf_dir, "customer"))
            cat = EngineCatalog()
            cat.register(spec)
            rep = Replayer(spark, cat, store)
            sink = JdbcApplySink(
                spark, store, spec, url=url, target_table="customer",
                properties=props,
            )
            bronze = _customer_cdc_bronze(spark, sf_dir)
            parsed = rep.parse_batch(bronze).localCheckpoint()
            summary = rep._batch_summary(parsed)
            rep.apply_batch(bronze, events=parsed, summary=summary)
            keys = touched_keys(parsed, spec)
            # the staged slice exactly as _stage_slice builds it, pre-write
            pk = list(spec.pk_cols)
            new = (
                store.read_for_keys(spec, keys)
                if hasattr(store, "read_for_keys")
                else store.read(spec)
            )
            t = F.broadcast(keys.select(*pk).distinct())
            slice_df = new.join(t, on=pk, how="left_semi")
            cols = [c.name for c in spec.columns]
            non_pk = [c for c in spec.columns if c.name not in pk]
            key_rows = t.select(
                *pk,
                *[F.lit(None).cast(c.spark_type).alias(c.name) for c in non_pk],
            ).withColumn("__key_only", F.lit(True))
            staged = (
                slice_df.select(*cols)
                .withColumn("__key_only", F.lit(False))
                .unionByName(key_rows.select(*cols, "__key_only"))
                .coalesce(sink.staging_partitions)
            )
            write("cdc_jdbc_apply_customer_staged", _explain(staged))
        finally:
            shutil.rmtree(root, ignore_errors=True)
            try:
                jvm.java.sql.DriverManager.getConnection(url + ";drop=true")
            except Exception:
                pass

    jdbc_plan()

    # ---- bounded stream drains ------------------------------------------
    # Pre-start streaming plan + the state width the drained checkpoint
    # recorded (offsets pin spark.sql.shuffle.partitions at query start).
    from connemara_spark.queries import (
        _drain_to_table,
        _land_stream_segments,
    )
    from connemara_spark.streaming.windows import interval_left_join_streams

    def stream_plan():
        from datetime import timedelta

        ev = load(spark, sf_dir, "events").select(
            "event_id", F.col("ts").cast("timestamp_ltz").alias("ts"),
            "user_id", "event_type",
        )
        row = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
        mid = row["lo"] + (row["hi"] - row["lo"]) / 2
        sentinel_ts = row["hi"] + timedelta(hours=8)
        sentinel = spark.createDataFrame(
            [(-1, sentinel_ts, -1, "click"), (-2, sentinel_ts, -1, "purchase")],
            schema=ev.schema,
        )
        root = tempfile.mkdtemp(prefix="r11plans_stream_")
        try:
            land = _land_stream_segments(
                root,
                [
                    ev.filter(F.col("ts") < F.lit(mid)),
                    ev.filter(F.col("ts") >= F.lit(mid)).unionByName(sentinel),
                ],
            )
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(land)
            )
            clicks = stream.filter(F.col("event_type") == "click").select(
                F.col("event_id").alias("click_id"), "user_id",
                F.col("ts").alias("click_ts"),
            )
            purchases = stream.filter(F.col("event_type") == "purchase").select(
                F.col("event_id").alias("purchase_id"), "user_id",
                F.col("ts").alias("purchase_ts"),
            )
            joined = interval_left_join_streams(
                clicks, purchases, key="user_id",
                left_ts="click_ts", right_ts="purchase_ts",
                watermark="1 hour", max_gap="6 hours",
            )
            ckpt = os.path.join(root, "ckpt")
            try:
                from connemara_spark.queries import _stream_state_width

                _drain_to_table(
                    spark, joined, ckpt,
                    state_width=_stream_state_width(spark, land),
                )
            except ImportError:
                _drain_to_table(spark, joined, ckpt)
            width = "?"
            offs = sorted(glob.glob(os.path.join(ckpt, "offsets", "*")))
            if offs:
                for line in open(offs[-1]):
                    line = line.strip()
                    if line.startswith("{") and "shuffle.partitions" in line:
                        width = json.loads(line)["conf"][
                            "spark.sql.shuffle.partitions"
                        ]
            text = (
                f"state width recorded in the drained checkpoint's offsets "
                f"(spark.sql.shuffle.partitions at query start): {width}\n\n"
                "pre-start streaming plan (formatted):\n"
            ) + _explain(joined)
            write("events_stream_interval_left_join", text)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    stream_plan()

    print("done")


if __name__ == "__main__":
    main()
