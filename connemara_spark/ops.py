"""Operational surface: archive sink, spool GC, maintenance, fixer (SURVEY
§2.1 S9/S10, §2.8 W10, §2.7 D15).

Reference behaviors re-expressed for a parquet/object-store world:

- **ArchiveSink** — ``replication.replayed`` audit copy of applied events
  (replayer/connemara_replay.pl:505-531, table :754-758, SIGUSR1 toggle
  :596-600,761). Here: an append-only parquet audit zone, partitioned by
  ingest date so retention is a partition drop.
- **spool_gc** — applied-spool deletion (replay.pl:507-531,558-571). The
  bronze landing zone is immutable files, so GC = dropping whole files whose
  newest row is at or below the applied LSN watermark (footer-stats check,
  no data read).
- **Maintenance** — the caught-up async worker (replay.pl:766-777,
  connemara_reindex.sh): compacts a silver table's small files and sorts
  within partitions by PK (the cluster-scale analog of building indexes).
- **Fixer** — connemara_fixer.pl's head-of-queue stuck-DDL repair loop
  (replayer/connemara_fixer.pl:48-188) as a plain CLI: show the first
  pending DDL above the watermark, apply an edited statement, or skip it.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connemara_spark.catalog import EngineCatalog, TableSpec
from connemara_spark.events import BRONZE_SCHEMA, is_ddl_event, parse_events


# --------------------------------------------------------------- archive (S9)


class ArchiveSink:
    """Append-only audit copy of applied spool rows.

    ``enabled`` mirrors the reference's SIGUSR1 ``keep_data`` runtime toggle
    (replay.pl:596-600): flip it on a live replayer without restarting.
    Rows append under ``archive_dir/ingest_date=YYYY-MM-DD/`` so retention
    (`expire`) is a partition-directory drop — O(1) metadata, no rewrite.
    """

    def __init__(self, spark: SparkSession, archive_dir: str, *, enabled: bool = True):
        self.spark = spark
        self.archive_dir = archive_dir
        self.enabled = enabled

    def append(self, bronze: DataFrame) -> None:
        if not self.enabled:
            return
        (
            bronze.withColumn("ingest_date", F.to_date("insert_timestamp"))
            .write.mode("append")
            .partitionBy("ingest_date")
            .parquet(self.archive_dir)
        )

    def read(self) -> DataFrame:
        # StructType.add mutates in place — build the partitioned schema from
        # a copy so the shared BRONZE_SCHEMA stays 7 fields wide.
        from pyspark.sql import types as T

        schema = T.StructType(list(BRONZE_SCHEMA.fields)).add("ingest_date", T.DateType())
        return self.spark.read.schema(schema).parquet(self.archive_dir)

    def expire(self, older_than_date: str) -> list[str]:
        """Drop archive partitions strictly older than ``older_than_date``
        (ISO). Returns dropped partition names."""
        import shutil

        dropped = []
        if not os.path.isdir(self.archive_dir):
            return dropped
        for entry in sorted(os.listdir(self.archive_dir)):
            if entry.startswith("ingest_date=") and entry.split("=", 1)[1] < older_than_date:
                shutil.rmtree(os.path.join(self.archive_dir, entry))
                dropped.append(entry)
        return dropped


# -------------------------------------------------------------- spool GC (S10)


def spool_gc(
    spark: SparkSession,
    spool_dir: str,
    applied_watermarks: dict[tuple[str, str], int],
    *,
    dry_run: bool = False,
) -> list[str]:
    """Delete landing-zone files fully covered by the applied LSN watermark.

    A file is removable iff for EVERY (database, source_slotname) group it
    contains, ``max(lsn_start) <= watermark[group]`` — the distributed
    version of the reference's delete-applied-ctids batches
    (replay.pl:507-531). One aggregate over file-grouped metadata; files are
    immutable so this is safe concurrent with an active reader.
    """
    files = (
        spark.read.schema(BRONZE_SCHEMA)
        .parquet(spool_dir)
        .withColumn("_file", F.input_file_name())
        .groupBy("_file", "database", "source_slotname")
        .agg(F.max("lsn_start").alias("max_lsn"))
        .collect()
    )
    by_file: dict[str, list] = {}
    for r in files:
        by_file.setdefault(r["_file"], []).append(r)
    removable = [
        f
        for f, groups in by_file.items()
        if all(
            g["max_lsn"] <= applied_watermarks.get((g["database"], g["source_slotname"]), -1)
            for g in groups
        )
    ]
    if not dry_run:
        for f in removable:
            path = f.replace("file://", "")
            if os.path.exists(path):
                os.remove(path)
    return removable


# ------------------------------------------------------------ maintenance (W10)


@dataclass
class CompactionReport:
    """One maintenance action. ``action`` disambiguates what the idle pass
    actually did — the counts mean different things per kind:

    - ``"compact"``: files (or chain versions) before/after the rewrite
    - ``"gc"``: chain length before/after a retention-only pass
    - ``"rebucket"``: BUCKET counts before/after the layout growth
    """

    table: str
    files_before: int
    files_after: int
    action: str = "compact"


class Maintenance:
    """Caught-up background maintenance: file compaction + PK clustering.

    The reference builds FK indexes asynchronously only when replication has
    caught up (replay.pl:766-777; 16-way reindex connemara_reindex.sh:3).
    The object-store analog: when the stream is idle, rewrite fragmented
    silver tables into ``target_partitions`` files sorted within partitions
    by PK — keeps scan counts low and point-lookup merges cheap at scale.
    """

    def __init__(
        self,
        store,
        catalog: EngineCatalog,
        *,
        target_partitions: int = 8,
        max_chain: int = 32,
        keep_last: int = 2,
        target_bucket_bytes: int | None = None,
        max_auto_buckets: int = 4096,
    ):
        self.store = store
        self.catalog = catalog
        self.target_partitions = target_partitions
        # layout-growth policy for chained stores: when a table's CURRENT
        # snapshot averages more than this many bytes per bucket, the idle
        # pass rebuckets it to the next power-of-2 count that fits — the
        # bucket is the partial apply's unit of IO, so its byte envelope
        # is what must track executor memory as the table grows 100x.
        # None (default) disables automatic rebucketing.
        # ``max_auto_buckets`` bounds automatic growth: parquet files cost
        # KBs of metadata regardless of rows, so a target below that
        # per-file floor could never be reached and the policy would
        # otherwise double forever; the cap turns that misconfiguration
        # into a stable (capped) state. Manual ``rebucket`` is uncapped.
        self.target_bucket_bytes = target_bucket_bytes
        self.max_auto_buckets = max_auto_buckets
        # version-chain policy for chained stores (BucketStore): partial
        # rewrites keep old versions alive as bucket hosts, growing read
        # fan-in; once a table's physical chain exceeds ``max_chain`` the
        # idle pass compacts it into one self-contained version and runs
        # reference-counted GC. ``keep_last`` defaults to 2 so a
        # MaintainedAggView's version-anchored recovery point survives
        # (ivm.py docstring: GC'ing it fails the next patch loudly).
        self.max_chain = max_chain
        self.keep_last = keep_last

    @staticmethod
    def stream_is_idle(progress: dict | None) -> bool:
        """True when the last streaming progress shows no inflow (the
        'caught up' predicate, replay.pl:774)."""
        if not progress:
            return True
        return float(progress.get("inputRowsPerSecond") or 0.0) == 0.0

    def compact_table(self, spec: TableSpec) -> CompactionReport:
        df = self.store.read(spec)
        before = df.rdd.getNumPartitions()
        out = df.repartition(self.target_partitions)
        if spec.pk_cols:
            out = out.sortWithinPartitions(*spec.pk_cols)
        self.store.write(spec, out)
        return CompactionReport(spec.target_name, before, self.target_partitions)

    def run(self, *, progress: dict | None = None) -> list[CompactionReport]:
        if not self.stream_is_idle(progress):
            return []
        out = []
        for spec in self.catalog.tables():
            if hasattr(self.store, "chain_length"):
                # chained store: compaction is a FULL rewrite, so pay it
                # only when the version chain has actually fragmented —
                # short chains are exactly what the partial-rewrite store
                # exists to keep cheap. Buckets never fragment INTERNALLY
                # (one file per bucket per hosting version), so there is
                # no small-file debt to rewrite under the threshold; the
                # debt a short chain does accrue is storage held by
                # no-longer-referenced host versions, and retention GC is
                # pure directory bookkeeping (zero Spark jobs) — run it
                # every idle pass instead of waiting for a compaction.
                rb = self._maybe_rebucket(spec)
                if rb is not None:
                    out.append(rb)
                before = self.store.chain_length(spec)
                if before <= self.max_chain:
                    self.store.gc_versions(spec, keep_last=self.keep_last)
                    after = self.store.chain_length(spec)
                    if after != before:
                        out.append(
                            CompactionReport(
                                spec.target_name, before, after, action="gc"
                            )
                        )
                    continue
                self.store.compact(spec)
                self.store.gc_versions(spec, keep_last=self.keep_last)
                out.append(
                    CompactionReport(
                        spec.target_name, before, self.store.chain_length(spec)
                    )
                )
            else:
                out.append(self.compact_table(spec))
        return out

    def _maybe_rebucket(self, spec: TableSpec) -> CompactionReport | None:
        """Grow a table's bucket count when its CURRENT snapshot averages
        more than ``target_bucket_bytes`` per bucket — the automatic
        layout-growth half of W10: the rebucket is a full rewrite, so it
        runs only on idle passes, and the new count is the next power-of-2
        MULTIPLE of the current count that brings the per-bucket envelope
        back under target, never exceeding ``max_auto_buckets`` (the
        doubling stops while the next step still fits under the cap, so a
        count that is not a power-of-2 divisor of the cap cannot overshoot
        it). Reports (old count, new count)."""
        if self.target_bucket_bytes is None or not hasattr(self.store, "rebucket"):
            return None
        n = self.store.bucket_count(spec.target_name)
        size = self.store.table_bytes(spec)
        if size <= n * self.target_bucket_bytes:
            return None
        new_n = n
        while (
            size > new_n * self.target_bucket_bytes
            and new_n * 2 <= self.max_auto_buckets
        ):
            new_n *= 2
        if new_n <= n:
            return None  # already at (or beyond) the auto-growth cap
        self.store.rebucket(spec, new_n)
        return CompactionReport(spec.target_name, n, new_n, action="rebucket")


# ------------------------------------------------------------------ fixer (D15)


@dataclass
class ForgetReport:
    table: str
    rows_removed: int
    new_version: int | None


def forget_keys(
    store,
    specs: list,
    key_col: str,
    key_values: list,
    *,
    tombstone_path: str | None = None,
) -> list[ForgetReport]:
    """Targeted erasure (right-to-be-forgotten): remove every row whose
    ``key_col`` is in ``key_values`` from each listed silver table,
    committing a NEW store version per table (the versioned store makes the
    operation atomic-per-table and auditable) and appending a tombstone
    record so downstream consumers (training-data exports, maintained
    views) can re-filter historical versions.

    Scale shape: one broadcast semi-join-style filter per table — a full
    scan + rewrite, the honest cost of erasure on immutable storage (the
    same cost Delta/Iceberg DELETE pays); tables without ``key_col`` are
    skipped with a zero-row report. When the store supports partial
    rewrites (``stores.BucketStore``) AND the erasure key IS the table's
    PK, only the buckets the erased keys hash into are rewritten —
    erasure cost drops from O(table) to O(touched buckets). NOTE: earlier
    store versions retain the rows until retention GC drops them —
    erasure completes when GC passes; the tombstone records what must
    stay filtered until then.
    """
    reports: list[ForgetReport] = []
    vals = set(key_values)
    for spec in specs:
        df = store.read(spec)
        if key_col not in df.columns:
            reports.append(ForgetReport(spec.target_name, 0, None))
            continue
        hit = df.filter(F.col(key_col).isin(*vals))
        n = hit.count()
        if n:
            # NULL-keyed rows must SURVIVE: ~isin is NULL (not true) for
            # them under three-valued logic, which would silently destroy
            # every NULL-keyed row beyond the requested erasure
            survivors = ~F.col(key_col).isin(*vals) | F.col(key_col).isNull()
            if hasattr(store, "write_partial") and spec.pk_cols == [key_col]:
                # bucket pruning is sound only when the erasure key is the
                # bucket key (the PK): a non-PK key's rows can live in any
                # bucket
                keys = hit.select(key_col).distinct()
                buckets = store.buckets_of(spec, keys)
                store.write_partial(
                    spec,
                    store.read_buckets(spec, buckets).filter(survivors),
                    buckets=buckets,
                )
            else:
                store.write(spec, df.filter(survivors))
        reports.append(
            ForgetReport(
                spec.target_name, n, store.current_version(spec.target_name)
            )
        )
    if tombstone_path:
        rec = {
            "key_col": key_col,
            "key_values": sorted(map(str, key_values)),
            "tables": {r.table: r.rows_removed for r in reports},
        }
        os.makedirs(os.path.dirname(tombstone_path) or ".", exist_ok=True)
        with open(tombstone_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    return reports


@dataclass
class StuckDDL:
    database: str
    lsn_start: int
    insert_timestamp: str
    query: str
    search_path: str | None


class Fixer:
    """Head-of-queue stuck-DDL repair (connemara_fixer.pl:48-188, minus the
    curses UI): inspect the first pending DDL above the watermark, execute a
    (possibly human-edited) replacement, or skip it by advancing the
    watermark — the atomic execute+delete of the reference (:161-188).
    """

    def __init__(self, spark: SparkSession, replayer, watermark, spool_dir: str):
        self.spark = spark
        self.replayer = replayer
        self.watermark = watermark
        self.spool_dir = spool_dir

    def _pending_ddl(self) -> DataFrame:
        bronze = self.spark.read.schema(BRONZE_SCHEMA).parquet(self.spool_dir)
        fresh = self.watermark.filter_applied(bronze)
        events = parse_events(fresh)
        return events.filter(is_ddl_event()).orderBy("insert_timestamp", "lsn_start")

    def head(self) -> StuckDDL | None:
        """The next DDL event in apply order (fixer's LIMIT 1 fetch,
        connemara_fixer.pl:89-102)."""
        rows = self._pending_ddl().limit(1).collect()
        if not rows:
            return None
        r = rows[0]
        rec = dict(zip(r["columnnames"] or [], r["columnvalues"] or []))
        return StuckDDL(
            database=r["database"],
            lsn_start=r["lsn_start"],
            insert_timestamp=str(r["insert_timestamp"]),
            query=rec.get("current_query", ""),
            search_path=rec.get("search_path"),
        )

    def apply_edited(self, stuck: StuckDDL, edited_query: str) -> str:
        """Execute an edited statement in place of the stuck one, then
        advance past it (connemara_fixer.pl:161-188)."""
        from connemara_spark.ddl.rewriter import DDLAction, classify_ddl

        known = {
            s.schema for s in self.replayer.catalog.tables() if s.database == stuck.database
        } | {"public"}
        decision = classify_ddl(edited_query, stuck.database, known_schemas=known)
        if decision.action == DDLAction.SKIP:
            tag = f"skip:{decision.reason}"
        else:
            tag = self.replayer.executor.execute(decision, stuck.database)
        self.skip(stuck)
        return tag

    def skip(self, stuck: StuckDDL) -> None:
        """Advance the watermark past the stuck event without executing it
        (the fixer's delete-spool-row outcome)."""
        slots = {
            (r["database"], r["source_slotname"])
            for r in self.spark.read.schema(BRONZE_SCHEMA)
            .parquet(self.spool_dir)
            .filter(
                (F.col("database") == stuck.database) & (F.col("lsn_start") == stuck.lsn_start)
            )
            .select("database", "source_slotname")
            .collect()
        }
        self.watermark.advance({k: stuck.lsn_start for k in slots})


def fixer_main(argv: list[str] | None = None) -> int:
    """CLI: ``python -m connemara_spark.ops SPOOL_DIR CATALOG_JSON STORE_DIR
    [--apply SQL | --skip]`` — show/repair the head-of-queue stuck DDL."""
    import argparse

    from connemara_spark.pipeline import ParquetStore, Replayer
    from connemara_spark.session import get_spark
    from connemara_spark.streaming.driver import LsnWatermark

    ap = argparse.ArgumentParser(prog="connemara-fixer", description=Fixer.__doc__)
    ap.add_argument("spool_dir")
    ap.add_argument("catalog_json")
    ap.add_argument("store_dir")
    ap.add_argument("--watermark", default=None, help="lsn watermark json path")
    ap.add_argument("--apply", metavar="SQL", default=None, help="execute edited SQL for head")
    ap.add_argument("--skip", action="store_true", help="skip the head DDL")
    args = ap.parse_args(argv)

    spark = get_spark("connemara-fixer")
    with open(args.catalog_json) as fh:
        catalog = EngineCatalog.from_json(fh.read())
    store = ParquetStore(spark, args.store_dir)
    replayer = Replayer(spark, catalog, store)
    wm = LsnWatermark(args.watermark or os.path.join(args.store_dir, "lsn_watermark.json"))
    fixer = Fixer(spark, replayer, wm, args.spool_dir)

    stuck = fixer.head()
    if stuck is None:
        print("no pending DDL")
        return 0
    print(json.dumps(stuck.__dict__, indent=2))
    if args.apply:
        print("executed:", fixer.apply_edited(stuck, args.apply))
    elif args.skip:
        fixer.skip(stuck)
        print("skipped")
    return 0


if __name__ == "__main__":
    raise SystemExit(fixer_main())
