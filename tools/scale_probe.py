"""Scale-headroom probe: run the core operators 10-50x past the bench SF.

The sf0.1 bench verifies plan shape at 100k-600k rows; this probe
measures the SAME code paths on synthetically scaled inputs (millions of
rows, generated distributively with `spark.range` — nothing is collected
or hand-fed) to show throughput holds when the data grows an order of
magnitude, including a pathological hot key:

- **cdc_apply_3m**: 3M wal2json events (200k-key space + ONE key carrying
  300k updates) parsed and folded onto a 200k-row snapshot through
  ``apply_changes_bounded`` — the production hot-key path the Replayer
  auto-selects above 500k events/table.
- **exact_dedup_2m**: content-hash dedup over 2M documents (10% dup rate).
- **minhash_lsh_100k**: banded MinHash near-dup pairs over 100k synthetic
  documents with planted near-duplicates.
- **ann_srp_100k**: SRP-LSH ANN all-pairs top-k over 100k deterministic
  64-dim vectors (every vector is a query).

Prints one JSON line with per-op seconds and rows/sec. Run:
    python tools/scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from pyspark.sql import functions as F

    from connemara_spark.catalog import ColumnSpec, TableSpec
    from connemara_spark.events import parse_events
    from connemara_spark.operators.apply import apply_changes_bounded
    from connemara_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
    from connemara_spark.operators.similarity import srp_lsh_topk
    from connemara_spark.session import get_spark

    spark = get_spark()
    out = {}

    def timed(name, rows, fn):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        out[name] = {
            "input_rows": rows,
            "sec": round(dt, 2),
            "rows_per_sec": int(rows / dt),
            "result_rows": n,
        }
        print(f"{name}: {rows} rows in {dt:.1f}s ({int(rows/dt):,}/s)", file=sys.stderr)

    # -- 1. CDC apply: 3M events, 200k keys + one 300k-update hot key ------
    spec = TableSpec(
        database="db1", schema="public", table="accounts",
        columns=[ColumnSpec("id", "bigint"), ColumnSpec("v", "text"),
                 ColumnSpec("bal", "double precision")],
        pk_cols=["id"],
    )
    n_ev, keyspace = 3_000_000, 200_000
    ev = spark.range(n_ev).select(
        F.col("id").alias("lsn"),
        # 10% of the stream hammers key 7 (the counter-row pattern);
        # the redirect residue (3) is chosen not to collide with the
        # delete/insert key classes below (which end in 9 / 8)
        F.when(F.col("id") % 10 == 3, F.lit(7))
        .otherwise(F.col("id") % keyspace)
        .alias("k"),
        (F.col("id") % 997).cast("double").alias("amt"),
    )
    payload = F.to_json(
        F.struct(
            F.when(F.col("k") % 50 == 49, F.lit("delete"))
            .when(F.col("k") % 50 == 48, F.lit("insert"))
            .otherwise(F.lit("update"))
            .alias("kind"),
            F.lit("public").alias("schema"),
            F.lit("accounts").alias("table"),
            F.array(F.lit("id"), F.lit("v"), F.lit("bal")).alias("columnnames"),
            F.array(
                F.col("k").cast("string"),
                F.concat(F.lit("v#"), F.col("lsn").cast("string")),
                F.col("amt").cast("string"),
            ).alias("columnvalues"),
            F.struct(
                F.array(F.lit("id")).alias("keynames"),
                F.array(F.col("k").cast("string")).alias("keyvalues"),
            ).alias("oldkeys"),
        )
    )
    bronze = ev.select(
        F.lit("2024-06-01 00:00:00").cast("timestamp").alias("insert_timestamp"),
        F.lit("db1").alias("database"),
        F.lit("slot_db1").alias("source_slotname"),
        F.col("lsn").alias("lsn_start"),
        (F.col("lsn") + 10).alias("xid"),
        F.lit("2024-06-01 00:00:00").cast("timestamp").alias("xid_timestamp"),
        payload.alias("payload"),
    )
    snapshot = spark.range(keyspace).select(
        F.col("id"),
        F.concat(F.lit("base#"), F.col("id").cast("string")).alias("v"),
        F.lit(0.0).alias("bal"),
    )
    events = parse_events(bronze)
    timed(
        "cdc_apply_3m", n_ev,
        lambda: apply_changes_bounded(snapshot, events, spec, lsn_bucket=100_000).count(),
    )

    # -- 1b. merged batch summary at 3M events (r7) -------------------------
    # The Replayer prices every batch with ONE aggregation (_batch_summary:
    # DDL rows + per-table counts + touched-bucket sets) where it used to
    # pay three collects. Probe both shapes over the same CACHED parse so
    # the delta is pure job structure, at 30x the bench batch size.
    from connemara_spark.catalog import EngineCatalog
    from connemara_spark.events import split_ddl_dml
    from connemara_spark.operators.apply import _effective_spec
    from connemara_spark.operators.ivm import touched_keys
    from connemara_spark.pipeline import Replayer

    class _BucketedStoreStub:
        """Shape-only store: gives the summary its bucket arm (the probe
        never reads or writes — it measures the pricing job itself)."""

        n_buckets = 64

        def write_partial(self, *a, **k):  # pragma: no cover - marker only
            raise NotImplementedError

    cat = EngineCatalog()
    cat.register(
        TableSpec(
            database=spec.database, schema=spec.schema, table=spec.table,
            columns=[ColumnSpec(c.name, c.pg_type) for c in spec.columns],
            pk_cols=list(spec.pk_cols),
        )
    )
    rep = Replayer(spark, cat, _BucketedStoreStub())
    cached_events = events.persist()
    cached_events.count()  # materialize the parse outside both timings
    timed(
        "batch_summary_merged_3m", n_ev,
        lambda: sum(rep._batch_summary(cached_events)[1].values()),
    )

    def legacy_three_collects():
        ddl_df, dml = split_ddl_dml(cached_events)
        ddl_df.select("insert_timestamp", "lsn_start", "database",
                      "columnnames", "columnvalues").collect()
        counts = {
            (r["database"], r["schema"], r["table"]): r["n"]
            for r in dml.groupBy("database", "schema", "table")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        espec, _ = _effective_spec(cat.tables()[0])
        keys = touched_keys(dml, espec)
        keys.select(
            F.pmod(F.xxhash64(*[F.col(c) for c in espec.pk_cols]),
                   F.lit(64)).cast("int").alias("__b")
        ).distinct().collect()
        return sum(counts.values())

    timed("batch_summary_legacy3_3m", n_ev, legacy_three_collects)
    cached_events.unpersist()

    # -- 2. exact dedup: 2M docs, ~10% duplicates --------------------------
    n_docs = 2_000_000
    docs2m = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        # ids sharing id%1.8M produce byte-identical text -> dups
        F.concat(F.lit("doc body "), (F.col("id") % 1_800_000).cast("string")).alias("text"),
    )
    timed("exact_dedup_2m", n_docs, lambda: exact_dedup(docs2m, "doc_id", "text").count())

    # -- 3. MinHash LSH near-dup: 100k docs with planted near-dups ---------
    n_nd = 100_000
    words = F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        # base id i and i+50000 share all words except a planted few
        lambda j: F.concat(
            F.lit("w"),
            F.when(
                (F.col("doc_id") >= 50_000) & (j % 15 == 0),
                F.lit(999_999),
            ).otherwise((F.col("doc_id") % 50_000) * 31 + j),
        ),
    )
    near = spark.range(n_nd).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"),
    )
    timed(
        "minhash_lsh_100k", n_nd,
        lambda: minhash_lsh_pairs(
            near, "doc_id", "text", k=5, num_hashes=64, bands=16, threshold=0.5
        ).count(),
    )

    # -- 4. SRP-LSH ANN: 100k vectors, 2k queries --------------------------
    dim, n_vec = 64, 100_000
    emb = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id") * 64 + j), F.lit(2001)) - 1000
            ).cast("float") / 1000.0,
        ).alias("embedding"),
    )
    timed(
        "ann_srp_100k", n_vec,
        lambda: srp_lsh_topk(
            emb, k=10, n_bits=16, n_tables=4, dim=dim
        ).count(),
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
