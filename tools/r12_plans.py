"""Capture .explain("formatted") for every surface the r12 optimization
round touched, writing plans/r12/<name>_{before,after}.txt.

Usage:
    PYTHONPATH=<tree> python tools/r12_plans.py <before|after> [out_dir]

Run once with PYTHONPATH pointing at the round-start worktree (suffix
"before") and once against the optimized repo (suffix "after"). Only
APIs present in both trees are used; tree-specific behavior (the
python_keys width hint, the Derby staging width) is reached through the
tree's OWN query/construction path so each capture reflects what that
tree actually executes.

Captured surfaces and the r12 claims they pin:
- table_profile_orders / q21_exclusive_return_suppliers: Expand nodes
  removed (plan restructure — values unchanged, parity-gated).
- cdc_maintained_{minmax,topk,distinct}_view steady-state patch frames
  and the apply fold's pre-write frame: plans IDENTICAL before/after —
  the r12 change caches the Column construction (py4j cost), not the
  plan.
- doc_stream_neardup_md5 / doc_stream_dedup drains: the state width the
  drained checkpoint records (offsets pin spark.sql.shuffle.partitions
  at query start) — 8 before, CPU-width after (python_keys hint).
- cdc_jdbc_apply_customer staged slice: the pre-write frame's Coalesce
  width — 8 before, 1 after (embedded-Derby single-writer tuning).
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _explain(df) -> str:
    from connemara_spark.plans.inspect import formatted_plan

    return formatted_plan(df)


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after")
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans/r12"
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from pyspark.sql import functions as F

    from connemara_spark.session import get_spark

    spark = get_spark("r12-plans")
    spark.range(1).collect()

    def write(name: str, text: str) -> None:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")

    # ---- direct-return queries (the returned frame IS the plan) --------
    from connemara_spark.queries import REGISTRY

    for q in ("table_profile_orders", "q21_exclusive_return_suppliers"):
        try:
            write(q, _explain(REGISTRY[q].fn(spark, sf_dir)))
        except Exception as exc:  # noqa: BLE001
            write(q, f"capture failed: {exc}")

    # ---- maintained views: steady-state patch frames + the apply fold --
    from connemara_spark.catalog import ColumnSpec, EngineCatalog, TableSpec
    from connemara_spark.operators.ivm import (
        MaintainedDistinctCountView,
        MaintainedMinMaxView,
        MaintainedTopKView,
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

    def ivm_and_fold_plans():
        root = tempfile.mkdtemp(prefix="r12plans_ivm_")
        try:
            spec = fresh_spec()
            store = ParquetStore(spark, root)
            store.write(spec, load(spark, sf_dir, "customer"))
            cat = EngineCatalog()
            cat.register(spec)
            rep = Replayer(spark, cat, store)
            views = {
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
                if i == 1:
                    # steady state: explain the fold's pre-write frame
                    # (the exact plan apply_batch would execute)
                    counts = summary[1]
                    key = (spec.database, spec.schema, spec.table)
                    new_state, _bks, _bounded = rep.build_fold(
                        parsed, spec, n_events=counts.get(key, 0), buckets=None
                    )
                    write("apply_fold_prewrite", _explain(new_state))
                rep.apply_batch(bronze.filter(in_b), events=parsed, summary=summary)
                if i == 0:
                    for v in views.values():
                        v.after_apply()
                else:
                    for name, v in views.items():
                        patched = v._patch_frame()[1]
                        write(name, _explain(patched))
        finally:
            shutil.rmtree(root, ignore_errors=True)

    ivm_and_fold_plans()

    # ---- JDBC sink: the staged touched-key slice (Coalesce width) ------
    def jdbc_plan():
        import uuid

        from connemara_spark.operators.ivm import touched_keys
        from connemara_spark.sinks import JdbcApplySink
        from connemara_spark.stores import BucketStore

        root = tempfile.mkdtemp(prefix="r12plans_jdbc_")
        url = f"jdbc:derby:memory:r12plans_{uuid.uuid4().hex}"
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
            # construct the sink the way THIS tree's query does — the r12
            # tree passes staging_partitions=1 for embedded Derby
            qsrc = inspect.getsource(REGISTRY["cdc_jdbc_apply_customer"].fn)
            kw = {"staging_partitions": 1} if "staging_partitions=1" in qsrc else {}
            sink = JdbcApplySink(
                spark, store, spec, url=url, target_table="customer",
                properties=props, **kw,
            )
            bronze = _customer_cdc_bronze(spark, sf_dir)
            parsed = rep.parse_batch(bronze).localCheckpoint()
            summary = rep._batch_summary(parsed)
            rep.apply_batch(bronze, events=parsed, summary=summary)
            keys = touched_keys(parsed, spec)
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
            write(
                "cdc_jdbc_apply_customer_staged",
                f"sink.staging_partitions = {sink.staging_partitions}\n\n"
                + _explain(staged),
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
            try:
                jvm.java.sql.DriverManager.getConnection(url + ";drop=true")
            except Exception:
                pass

    jdbc_plan()

    # ---- Python-stateful stream drains: recorded state width -----------
    from connemara_spark.queries import (
        _drain_to_table,
        _land_stream_segments,
        _stream_state_width,
    )

    def _drain_width(name: str, land: str, cands, root: str, keys_hint: int):
        """Drain the stream through THIS tree's width policy and report the
        width the checkpoint recorded."""
        ckpt = os.path.join(root, "ckpt")
        try:
            w = _stream_state_width(spark, land, python_keys=keys_hint)
        except TypeError:  # before-tree: no python_keys parameter
            w = _stream_state_width(spark, land)
        _drain_to_table(spark, cands, ckpt, state_width=w)
        width = "?"
        offs = sorted(glob.glob(os.path.join(ckpt, "offsets", "*")))
        if offs:
            for line in open(offs[-1]):
                line = line.strip()
                if line.startswith("{") and "shuffle.partitions" in line:
                    width = json.loads(line)["conf"][
                        "spark.sql.shuffle.partitions"
                    ]
        state_parts = glob.glob(os.path.join(ckpt, "state", "0", "*"))
        write(
            name,
            f"state width recorded in the drained checkpoint's offsets "
            f"(spark.sql.shuffle.partitions at query start): {width}\n"
            f"state-store partition dirs under state/0: {len(state_parts)}\n",
        )

    def neardup_width():
        from connemara_spark.operators.dedup import md5_band_rows
        from connemara_spark.streaming.stateful import lsh_candidates_stream

        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        row = docs.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).collect()[0]
        mid = (int(row["lo"]) + int(row["hi"])) // 2 + 1
        root = tempfile.mkdtemp(prefix="r12plans_lsh_")
        try:
            land = _land_stream_segments(
                root,
                [docs.filter(F.col("doc_id") < mid), docs.filter(F.col("doc_id") >= mid)],
            )
            stream = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(land)
            )
            cands = lsh_candidates_stream(
                md5_band_rows(stream, "doc_id", "text", k=5, num_hashes=16, bands=8)
            )
            _drain_width(
                "doc_stream_neardup_md5", land, cands, root,
                keys_hint=8 * (int(row["hi"]) - int(row["lo"]) + 1),
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def dedup_width():
        from connemara_spark.streaming.stateful import exact_dedup_stream

        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        row = docs.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).collect()[0]
        mid = (int(row["lo"]) + int(row["hi"])) // 2 + 1
        root = tempfile.mkdtemp(prefix="r12plans_dedup_")
        try:
            land = _land_stream_segments(
                root,
                [docs.filter(F.col("doc_id") < mid), docs.filter(F.col("doc_id") >= mid)],
            )
            stream = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(land)
            )
            _drain_width(
                "doc_stream_dedup", land, exact_dedup_stream(stream), root,
                keys_hint=int(row["hi"]) - int(row["lo"]) + 1,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)

    neardup_width()
    dedup_width()

    print("done")


if __name__ == "__main__":
    main()
