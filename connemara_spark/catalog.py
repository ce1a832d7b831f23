"""Engine catalog — the pg_catalog analog.

The reference recovers column types / PK columns / unique-index counts at
apply time from the target's catalogs (replay.pl:446-479, cached :65-127) and
invalidates those caches on DDL (replay.pl:480-503). Here the same facts live
in an explicit, serializable catalog keyed by (database, schema, table):

- per-column PG type -> Spark type (cast projection P5, replay.pl:133-156)
- ordered PK columns (pg_constraint⋈pg_attribute analog, replay.pl:456-467)
- has_extra_unique flag (pg_index analog, replay.pl:469-479; drives the
  routing downgrade F8, replay.pl:879-960)
- target naming: `<database>_<schema>`.`<table>` (connemara_rewrite.pm:13-21)

The catalog is plain Python (driver-side, small) and is snapshot to JSON so a
streaming job can restore it; DDL replay mutates it (the DISCARD analog,
replay.pl:580-595).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

# PG type name -> Spark type (SURVEY §1.2 mapping). Keys are normalized
# (lowercase, mods stripped).
_PG_TO_SPARK: dict[str, T.DataType] = {
    "smallint": T.ShortType(),
    "int2": T.ShortType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "int4": T.IntegerType(),
    "bigint": T.LongType(),
    "int8": T.LongType(),
    "serial": T.IntegerType(),
    "bigserial": T.LongType(),
    "oid": T.LongType(),
    "numeric": T.DecimalType(38, 18),
    "decimal": T.DecimalType(38, 18),
    "real": T.FloatType(),
    "float4": T.FloatType(),
    "double precision": T.DoubleType(),
    "float8": T.DoubleType(),
    "money": T.DecimalType(19, 2),
    "text": T.StringType(),
    "varchar": T.StringType(),
    "character varying": T.StringType(),
    "character": T.StringType(),
    "char": T.StringType(),
    "bpchar": T.StringType(),
    "name": T.StringType(),
    "uuid": T.StringType(),
    "json": T.StringType(),
    "jsonb": T.StringType(),
    "xml": T.StringType(),
    "cidr": T.StringType(),
    "inet": T.StringType(),
    "macaddr": T.StringType(),
    "interval": T.StringType(),
    "bytea": T.BinaryType(),
    "timestamp without time zone": T.TimestampType(),
    "timestamp with time zone": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "timestamptz": T.TimestampType(),
    "date": T.DateType(),
    "time without time zone": T.StringType(),
    "time with time zone": T.StringType(),
    "time": T.StringType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "pg_lsn": T.LongType(),
    "xid": T.LongType(),
}

_TYPE_MOD_RE = re.compile(r"\s*\(\s*\d+\s*(,\s*\d+\s*)?\)")
_NUMERIC_MOD_RE = re.compile(r"^(numeric|decimal)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)$")


def pg_type_to_spark(pg_type: str) -> T.DataType:
    """Map a PostgreSQL type name (as ``atttypid::regtype::text`` would print
    it, replay.pl:450-453) to a Spark DataType.

    Arrays (``x[]`` / ``_x``) map to ArrayType of the element mapping;
    ``numeric(p,s)`` keeps precision/scale; unknown types (enums, composites,
    domains) degrade to StringType — same spirit as the reference, which
    supports any type via text + cast (replay.pl:148).
    """
    t = pg_type.strip().lower()
    if t.endswith("[]"):
        return T.ArrayType(pg_type_to_spark(t[:-2]))
    if t.startswith("_"):
        return T.ArrayType(pg_type_to_spark(t[1:]))
    m = _NUMERIC_MOD_RE.match(t)
    if m:
        prec = int(m.group(2))
        scale = int(m.group(3) or 0)
        return T.DecimalType(prec, scale)
    t_nomod = _TYPE_MOD_RE.sub("", t)
    return _PG_TO_SPARK.get(t_nomod, T.StringType())


# Keyed by DataType.simpleString()
SPARK_TYPE_TO_PG: dict[str, str] = {
    "smallint": "smallint",
    "int": "integer",
    "bigint": "bigint",
    "float": "real",
    "double": "double precision",
    "string": "text",
    "binary": "bytea",
    "timestamp": "timestamp without time zone",
    "timestamp_ntz": "timestamp without time zone",
    "date": "date",
    "boolean": "boolean",
}


@dataclass
class ColumnSpec:
    name: str
    pg_type: str

    @property
    def spark_type(self) -> T.DataType:
        return pg_type_to_spark(self.pg_type)


@dataclass
class TableSpec:
    """One registered table — everything replay.pl learns from pg_catalog."""

    database: str
    schema: str
    table: str
    columns: list[ColumnSpec]
    pk_cols: list[str]  # ordered, per pg_constraint conkey order (replay.pl:456-467)
    has_extra_unique: bool = False  # pg_index count > pk (replay.pl:469-479)

    @property
    def target_schema(self) -> str:
        """Schema-map naming: `<db>_<schema>` (connemara_rewrite.pm:13-21)."""
        return f"{self.database}_{self.schema}"

    @property
    def target_name(self) -> str:
        return f"{self.target_schema}.{self.table}"

    @property
    def qualified_key(self) -> tuple[str, str, str]:
        return (self.database, self.schema, self.table)

    @property
    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]

    def spark_schema(self) -> T.StructType:
        return T.StructType([T.StructField(c.name, c.spark_type) for c in self.columns])

    def validate(self) -> None:
        names = set(self.column_names)
        if len(names) != len(self.columns):
            raise ValueError(f"{self.target_name}: duplicate column names")
        missing = [p for p in self.pk_cols if p not in names]
        if missing:
            raise ValueError(f"{self.target_name}: pk columns {missing} not in columns")
        if not self.pk_cols:
            # Reference dies when it can't find a PK (replay.pl:96); we
            # register but flag — apply falls back to whole-row keys.
            pass


class EngineCatalog:
    """Registry of TableSpecs keyed (database, schema, table).

    Replaces the replayer's per-connection caches (replay.pl:65-127); the DDL
    barrier calls mutators here instead of `DISCARD`-ing sessions
    (replay.pl:580-595).
    """

    def __init__(self) -> None:
        self._tables: dict[tuple[str, str, str], TableSpec] = {}

    def register(self, spec: TableSpec) -> TableSpec:
        spec.validate()
        self._tables[spec.qualified_key] = spec
        return spec

    def get(self, database: str, schema: str, table: str) -> TableSpec:
        try:
            return self._tables[(database, schema, table)]
        except KeyError:
            raise KeyError(f"table {database}.{schema}.{table} not registered") from None

    def maybe_get(self, database: str, schema: str, table: str) -> TableSpec | None:
        return self._tables.get((database, schema, table))

    def drop(self, database: str, schema: str, table: str) -> None:
        self._tables.pop((database, schema, table), None)

    def tables(self) -> list[TableSpec]:
        return list(self._tables.values())

    # --- DDL mutators (engine-catalog evolution, SURVEY §2.7 D11/D13) ---

    def add_column(self, database: str, schema: str, table: str, name: str, pg_type: str) -> None:
        spec = self.get(database, schema, table)
        if name in spec.column_names:
            raise ValueError(f"{spec.target_name}: column {name} already exists")
        spec.columns.append(ColumnSpec(name, pg_type))

    def drop_column(self, database: str, schema: str, table: str, name: str) -> None:
        spec = self.get(database, schema, table)
        if name in spec.pk_cols:
            raise ValueError(f"{spec.target_name}: cannot drop pk column {name}")
        spec.columns = [c for c in spec.columns if c.name != name]

    def rename_column(self, database: str, schema: str, table: str, old: str, new: str) -> None:
        spec = self.get(database, schema, table)
        for c in spec.columns:
            if c.name == old:
                c.name = new
        spec.pk_cols = [new if p == old else p for p in spec.pk_cols]

    def rename_table(self, database: str, schema: str, table: str, new_table: str) -> None:
        spec = self._tables.pop((database, schema, table))
        spec.table = new_table
        self._tables[spec.qualified_key] = spec

    # --- persistence (streaming jobs restore the catalog from JSON) ---

    def to_json(self) -> str:
        return json.dumps(
            [
                {
                    "database": s.database,
                    "schema": s.schema,
                    "table": s.table,
                    "columns": [{"name": c.name, "pg_type": c.pg_type} for c in s.columns],
                    "pk_cols": s.pk_cols,
                    "has_extra_unique": s.has_extra_unique,
                }
                for s in self._tables.values()
            ],
            indent=2,
        )

    @classmethod
    def from_json(cls, text: str) -> EngineCatalog:
        cat = cls()
        for row in json.loads(text):
            cat.register(
                TableSpec(
                    database=row["database"],
                    schema=row["schema"],
                    table=row["table"],
                    columns=[ColumnSpec(c["name"], c["pg_type"]) for c in row["columns"]],
                    pk_cols=row["pk_cols"],
                    has_extra_unique=row.get("has_extra_unique", False),
                )
            )
        return cat
