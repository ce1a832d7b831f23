"""Snapshot bootstrap — the basebackup analog (SURVEY §3.1).

The reference's `connemara_basebackup.py` takes a consistent snapshot of a
source PostgreSQL database: slot creation pins `(consistent_point,
snapshot_name)`, pg_dump's DDL is parsed/remapped/restored, table data is
copied 8-way parallel (ctid % 8), and a replication origin is seeded at the
snapshot LSN. The Spark equivalents:

- **schema**: either a DDL script (run through the splitter + classifier —
  the D1/D9 path) or JDBC metadata / existing parquet schemas.
- **data**: `spark.read.jdbc(..., numPartitions=N)` — the partitioned
  parallel scan that replaces the ctid-modulo COPY (restore.py:19,42-54) —
  or a parquet import for file-based snapshots.
- **origin seed**: the LSN watermark file (consistent_point analog,
  schema_dump.py:31-37; origin seed basebackup.py:181-190).

Restore-planner semantics (D9, sqlparser/__init__.py:169-281): CREATE TABLE
runs now; PK/UNIQUE constraints become catalog metadata (Spark has no
indexes); triggers/grants/policies/comments/non-unique indexes are dropped
(F6); views are dropped (docs/architecture.rst:123).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

import re

from connemara_spark.catalog import SPARK_TYPE_TO_PG, ColumnSpec, EngineCatalog, TableSpec
from connemara_spark.ddl.executor import DDLExecutor
from connemara_spark.ddl.remap import remap_statement
from connemara_spark.ddl.rewriter import DDLAction, UnknownStatementError, classify_ddl
from connemara_spark.ddl.splitter import split_statements


def spark_schema_to_specs(schema: T.StructType) -> list[ColumnSpec]:
    """Reverse type mapping: Spark StructType -> ColumnSpecs (pg type names)."""
    out = []
    for f in schema.fields:
        t = f.dataType
        if isinstance(t, T.DecimalType):
            pg = f"numeric({t.precision},{t.scale})"
        elif isinstance(t, T.ArrayType):
            el = SPARK_TYPE_TO_PG.get(t.elementType.simpleString(), "text")
            pg = f"{el}[]"
        else:
            pg = SPARK_TYPE_TO_PG.get(t.simpleString(), "text")
        out.append(ColumnSpec(f.name, pg))
    return out


def snapshot_from_parquet(
    spark: SparkSession,
    catalog: EngineCatalog,
    store,
    *,
    database: str,
    schema: str,
    tables: dict[str, str],  # table name -> parquet path
    pk_cols: dict[str, list[str]],
    consistent_lsn: int = 0,
    watermark=None,
) -> list[TableSpec]:
    """Bootstrap engine state from parquet exports: register specs, load
    data into the store under remapped names, seed the LSN watermark."""
    specs = []
    for name, path in tables.items():
        df = spark.read.parquet(path)
        spec = TableSpec(
            database=database,
            schema=schema,
            table=name,
            columns=spark_schema_to_specs(df.schema),
            pk_cols=pk_cols.get(name, []),
        )
        catalog.register(spec)
        store.write(spec, df)
        specs.append(spec)
    if watermark is not None:
        watermark.advance({(database, f"slot_{database}"): consistent_lsn})
    return specs


def snapshot_from_jdbc(
    spark: SparkSession,
    catalog: EngineCatalog,
    store,
    *,
    url: str,
    database: str,
    schema: str,
    tables: dict[str, list[str]],  # table name -> ordered pk cols
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> list[TableSpec]:
    """Partitioned parallel JDBC snapshot — S5's idiomatic mapping.

    The reference shards each table by ``ctid % 8`` across 8 psql processes
    (restore.py:19,42-54); Spark shards by pk range with ``numPartitions``
    (falling back to unsharded for tables without a single numeric pk).
    """
    props = {"driver": "org.postgresql.Driver", **(properties or {})}
    specs = []
    for name, pks in tables.items():
        fq = f"{schema}.{name}"
        reader_kwargs: dict = {}
        if len(pks) == 1:
            bounds = spark.read.jdbc(
                url,
                f"(SELECT min({pks[0]}) lo, max({pks[0]}) hi FROM {fq}) b",
                properties=props,
            ).collect()[0]
            # positional access: dialects disagree on alias case folding
            # (Derby uppercases unquoted aliases, PG lowercases)
            if bounds[0] is not None:
                reader_kwargs = dict(
                    column=pks[0],
                    lowerBound=int(bounds[0]),
                    upperBound=int(bounds[1]) + 1,
                    numPartitions=num_partitions,
                )
        df = spark.read.jdbc(url, fq, properties=props, **reader_kwargs)
        spec = TableSpec(
            database=database,
            schema=schema,
            table=name,
            columns=spark_schema_to_specs(df.schema),
            pk_cols=pks,
        )
        catalog.register(spec)
        store.write(spec, df)
        specs.append(spec)
    return specs


def restore_schema_script(
    script: str,
    database: str,
    catalog: EngineCatalog,
    store=None,
    *,
    ignored_schemas: list[str] | None = None,
) -> dict[str, int]:
    """Run a pg_dump-style schema script through split → classify → execute.

    Implements the restore planner's routing (D9): executable table/type/
    sequence DDL runs now; skip-classified statements (functions, comments,
    grants, indexes, triggers…) are dropped exactly like the reference's
    basebackup filters (F5/F6); psql commands are ignored; unknown
    statements in a *restore* context are skipped rather than fatal (the
    reference wraps failable objects in savepoints, __init__.py:264-277).

    Rewriting on this path is TOKEN-GRADE (ddl/remap.py — the basebackup
    analog of the reference's AST remapper): unlike the replay path's regex
    rewrite, it also remaps regclass literals inside sequence DEFAULTs
    (``nextval('public.seq'::regclass)``), the first thing a real pg_dump
    hits. The schema map covers schemas declared by CREATE SCHEMA in the
    script plus ``public``.
    """
    ignored = set(ignored_schemas or []) | {"_timescaledb_internal"}
    executor = DDLExecutor(catalog, store)
    counts = {"executed": 0, "skipped": 0, "ignored_schema": 0, "unknown": 0}
    statements = [st for st in split_statements(script)]
    schemas = {"public"}
    for st in statements:
        m = re.match(
            r'\s*CREATE\s+SCHEMA\s+(?:IF\s+NOT\s+EXISTS\s+)?("(?:[^"]|"")+"|[\w$]+)',
            st.stripped(),
            re.IGNORECASE,
        )
        if m:
            name = m.group(1)
            schemas.add(name[1:-1].replace('""', '"') if name.startswith('"') else name)
    schema_map: dict[str, str | None] = {s: f"{database}_{s}" for s in schemas}
    for st in statements:
        if st.is_psql:
            counts["skipped"] += 1
            continue
        sql = st.stripped().rstrip(";")
        if not sql or sql.startswith("--"):
            continue
        try:
            decision = classify_ddl(sql, database)
        except UnknownStatementError:
            counts["unknown"] += 1  # savepoint-tolerated analog
            continue
        if decision.action != DDLAction.EXECUTE:
            counts["skipped"] += 1
            continue
        # ignored-schema filter on the ORIGINAL qualifiers, before remap
        # (F5, basebackup.py:108-116)
        if any(re.search(rf"(^|[\s(]){re.escape(s)}\s*\.", sql) for s in ignored):
            counts["ignored_schema"] += 1
            continue
        # token-grade rewrite replaces the classifier's regex rewrite on
        # this path (regclass literals, quoted qualifiers, comment safety)
        remapped = remap_statement(sql, schema_map, default_schema="public")
        decision.sql = re.sub(
            r"(DROP\s+CONSTRAINT\s+)(?!IF\s+EXISTS)",
            r"\1IF EXISTS ",
            remapped,
            flags=re.IGNORECASE,
        )
        executor.execute(decision, database)
        counts["executed"] += 1
    return counts
