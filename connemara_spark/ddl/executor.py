"""DDL executor: executable-subset parser + catalog/store mutation.

The reference replays rewritten DDL against PostgreSQL (replay.pl:270-350)
and invalidates its catalog caches (D11). Here the *executable subset* maps
to engine-catalog mutations plus physical schema evolution on the table
store (add column = withColumn(NULL), drop = drop, rename = rename):

- CREATE TABLE (columns + PRIMARY KEY, inline or table-level)
- DROP TABLE [IF EXISTS]
- ALTER TABLE ADD/DROP/RENAME COLUMN, RENAME TO, ALTER COLUMN TYPE
- TRUNCATE
- CREATE/DROP SEQUENCE, TYPE — catalog-only entries (Spark has neither;
  the reference maps enum/composite values through text anyway)
- views — recorded, not materialized (the reference drops all views during
  basebackup, docs/architecture.rst:123, and replays view DDL best-effort)

A failed DROP TABLE on a missing object is tolerated (SQLSTATE 42P01
tolerance, replay.pl:327-342).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from connemara_spark.catalog import ColumnSpec, EngineCatalog, TableSpec
from connemara_spark.ddl.rewriter import DDLAction, DDLDecision, classify_ddl

_IDENT = r'(?:[A-Za-z_][\w$]*|"(?:[^"]|"")+")'
_QNAME_RE = re.compile(rf"({_IDENT})(?:\s*\.\s*({_IDENT}))?")


def _unquote(ident: str) -> str:
    if ident.startswith('"'):
        return ident[1:-1].replace('""', '"')
    return ident


def _parse_qname(text: str) -> tuple[str | None, str]:
    m = _QNAME_RE.match(text.strip())
    if not m:
        raise ValueError(f"bad qualified name: {text!r}")
    if m.group(2):
        return _unquote(m.group(1)), _unquote(m.group(2))
    return None, _unquote(m.group(1))


def _split_top_level_commas(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    in_str = False
    for c in s:
        if in_str:
            cur.append(c)
            if c == "'":
                in_str = False
            continue
        if c == "'":
            in_str = True
            cur.append(c)
        elif c == "(":
            depth += 1
            cur.append(c)
        elif c == ")":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


_CONSTRAINT_HEADS = (
    "primary key", "foreign key", "unique", "check", "constraint",
    "exclude", "like",
)


@dataclass
class ParsedCreateTable:
    schema: str | None
    table: str
    columns: list[ColumnSpec]
    pk_cols: list[str]
    has_extra_unique: bool


def parse_create_table(sql: str) -> ParsedCreateTable:
    m = re.match(
        r"CREATE\s+(?:UNLOGGED\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(.+?)\s*\((.*)\)\s*(?:WITH\b.*|TABLESPACE\b.*|PARTITION\b.*)?$",
        sql.strip().rstrip(";"),
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"unparsable CREATE TABLE: {sql[:80]}")
    schema, table = _parse_qname(m.group(1))
    body = m.group(2)
    columns: list[ColumnSpec] = []
    pk_cols: list[str] = []
    has_extra_unique = False
    for item in _split_top_level_commas(body):
        low = item.lower()
        if low.startswith(_CONSTRAINT_HEADS):
            pk_m = re.match(r"(?:constraint\s+\S+\s+)?primary\s+key\s*\((.*?)\)", low, re.DOTALL)
            if pk_m:
                pk_cols = [_unquote(c.strip()) for c in pk_m.group(1).split(",")]
            elif re.match(r"(?:constraint\s+\S+\s+)?unique\b", low):
                has_extra_unique = True
            continue
        cm = re.match(rf"({_IDENT})\s+(.+)$", item, re.DOTALL)
        if not cm:
            raise ValueError(f"unparsable column def: {item!r}")
        name = _unquote(cm.group(1))
        rest = cm.group(2)
        # type = everything up to a constraint keyword
        tm = re.split(
            r"\s+(?=(?:NOT\s+NULL|NULL|PRIMARY\s+KEY|UNIQUE|DEFAULT|REFERENCES|CHECK|CONSTRAINT|GENERATED|COLLATE)\b)",
            rest, flags=re.IGNORECASE, maxsplit=1,
        )
        pg_type = tm[0].strip().rstrip(",")
        columns.append(ColumnSpec(name, pg_type))
        if re.search(r"\bPRIMARY\s+KEY\b", rest, re.IGNORECASE):
            pk_cols = [name]
        elif re.search(r"\bUNIQUE\b", rest, re.IGNORECASE):
            has_extra_unique = True
    return ParsedCreateTable(schema, table, columns, pk_cols, has_extra_unique)


class DDLExecutor:
    """Applies classified DDL to an EngineCatalog (+ optional TableStore).

    The store argument is duck-typed: needs ``evolve_add_column(spec, name,
    spark_type)``, ``evolve_drop_column(spec, name)``, ``evolve_rename_column
    (spec, old, new)``, ``create_table(spec)``, ``drop_table(spec)``,
    ``truncate_table(spec)``, ``rename_table(spec, new_name)``. ``None``
    means catalog-only (dry) execution.
    """

    def __init__(self, catalog: EngineCatalog, store=None):
        self.catalog = catalog
        self.store = store
        self.views: dict[str, str] = {}
        self.sequences: set[str] = set()
        self.types: set[str] = set()

    def execute(self, decision: DDLDecision, database: str, source_schema: str = "public") -> str:
        """Execute one EXECUTE-classified DDL. Returns a short action tag."""
        if decision.action != DDLAction.EXECUTE or decision.sql is None:
            raise ValueError(f"execute() got a non-EXECUTE decision: {decision.action}")
        sql = decision.sql.strip().rstrip(";")
        low = sql.lower()

        def unmap_schema(schema: str | None) -> str:
            # decision.sql has remapped names (`db_schema`); strip the prefix
            # to address the catalog by source coordinates.
            if schema is None:
                return source_schema
            prefix = f"{database}_"
            return schema[len(prefix):] if schema.startswith(prefix) else schema

        if re.match(r"create\s+(or\s+replace\s+)?(materialized\s+)?view", low):
            vm = re.match(r"create\s+(?:or\s+replace\s+)?(?:materialized\s+)?view\s+(.+?)\s+as\s+(.*)$", sql, re.IGNORECASE | re.DOTALL)
            if vm:
                self.views[vm.group(1).strip()] = vm.group(2).strip()
            return "view-recorded"
        if re.match(r"(alter|drop)\s+(materialized\s+)?view", low):
            dm = re.match(r"drop\s+(?:materialized\s+)?view\s+(?:if\s+exists\s+)?(.+)$", sql, re.IGNORECASE)
            if dm:
                self.views.pop(dm.group(1).strip(), None)
            return "view-dropped"

        if re.match(r"create\s+sequence", low):
            sm = re.match(r"create\s+sequence\s+(?:if\s+not\s+exists\s+)?(\S+)", low)
            if sm:
                self.sequences.add(sm.group(1))
            return "sequence-recorded"
        if re.match(r"(alter|drop)\s+sequence", low):
            return "sequence-noop"
        if re.match(r"create\s+type", low):
            self.types.add(sql.split()[2])
            return "type-recorded"
        if re.match(r"(alter|drop)\s+type", low):
            return "type-noop"

        if re.match(r"create\s+(unlogged\s+)?table", low):
            parsed = parse_create_table(sql)
            spec = TableSpec(
                database=database,
                schema=unmap_schema(parsed.schema),
                table=parsed.table,
                columns=parsed.columns,
                pk_cols=parsed.pk_cols,
                has_extra_unique=parsed.has_extra_unique,
            )
            self.catalog.register(spec)
            if self.store is not None:
                self.store.create_table(spec)
            return "table-created"

        dm = re.match(r"drop\s+table\s+(if\s+exists\s+)?(.+)$", sql, re.IGNORECASE)
        if dm:
            schema, table = _parse_qname(dm.group(2))
            spec = self.catalog.maybe_get(database, unmap_schema(schema), table)
            if spec is None:
                # tolerated like SQLSTATE 42P01 (replay.pl:327-342)
                return "drop-missing-tolerated"
            if self.store is not None:
                self.store.drop_table(spec)
            self.catalog.drop(database, spec.schema, spec.table)
            return "table-dropped"

        tm = re.match(r"truncate\s+(table\s+)?(only\s+)?(.+)$", sql, re.IGNORECASE)
        if tm:
            schema, table = _parse_qname(tm.group(3))
            spec = self.catalog.get(database, unmap_schema(schema), table)
            if self.store is not None:
                self.store.truncate_table(spec)
            return "table-truncated"

        am = re.match(r"alter\s+table\s+(if\s+exists\s+)?(only\s+)?(.+?)\s+(add|drop|rename|alter)\s+(.*)$", sql, re.IGNORECASE | re.DOTALL)
        if am:
            schema, table = _parse_qname(am.group(3))
            schema = unmap_schema(schema)
            verb, rest = am.group(4).lower(), am.group(5)
            spec = self.catalog.get(database, schema, table)

            if verb == "add":
                # Table-level constraint additions are metadata, not columns:
                # without this guard the identifier regex below happily parses
                # "CONSTRAINT t_uq UNIQUE (a)" as a column named CONSTRAINT.
                km = re.match(
                    r"(?:constraint\s+(\S+)\s+)?(primary\s+key|foreign\s+key|unique|exclude|check)\b(.*)$",
                    rest.strip(), re.IGNORECASE | re.DOTALL,
                )
                if km:
                    kind = re.sub(r"\s+", " ", km.group(2).lower())
                    tail = km.group(3)
                    if kind == "primary key":
                        pkm = re.search(r"\(\s*(.*?)\s*\)", tail, re.DOTALL)
                        if pkm:
                            spec.pk_cols = [
                                _unquote(c.strip()) for c in pkm.group(1).split(",")
                            ]
                        return "pk-added"
                    if kind == "unique":
                        spec.has_extra_unique = True
                        return "unique-added"
                    # FK / EXCLUDE / CHECK: no engine-side effect (the store
                    # has no constraint enforcement; reference replays them
                    # against PG, replay.pl:270-350)
                    return "constraint-noop"
                cm = re.match(rf"(column\s+)?(if\s+not\s+exists\s+)?({_IDENT})\s+(.+)$", rest, re.IGNORECASE | re.DOTALL)
                if not cm:
                    raise ValueError(f"unparsable ADD COLUMN: {rest!r}")
                name = _unquote(cm.group(3))
                pg_type = re.split(
                    r"\s+(?=(?:NOT\s+NULL|NULL|DEFAULT|REFERENCES|CHECK|UNIQUE|PRIMARY\s+KEY)\b)",
                    cm.group(4), flags=re.IGNORECASE, maxsplit=1,
                )[0].strip()
                self.catalog.add_column(database, schema, table, name, pg_type)
                if self.store is not None:
                    self.store.evolve_add_column(spec, name, ColumnSpec(name, pg_type).spark_type)
                return "column-added"

            if verb == "drop":
                cm = re.match(rf"(column\s+)?(if\s+exists\s+)?({_IDENT})", rest, re.IGNORECASE)
                if not cm:
                    raise ValueError(f"unparsable DROP COLUMN: {rest!r}")
                name = _unquote(cm.group(3))
                self.catalog.drop_column(database, schema, table, name)
                if self.store is not None:
                    self.store.evolve_drop_column(spec, name)
                return "column-dropped"

            if verb == "rename":
                rm = re.match(rf"(column\s+)?({_IDENT})\s+to\s+({_IDENT})", rest, re.IGNORECASE)
                if rm and rm.group(1):
                    old, new = _unquote(rm.group(2)), _unquote(rm.group(3))
                    self.catalog.rename_column(database, schema, table, old, new)
                    if self.store is not None:
                        self.store.evolve_rename_column(spec, old, new)
                    return "column-renamed"
                rm = re.match(rf"to\s+({_IDENT})", rest, re.IGNORECASE)
                if rm:
                    new = _unquote(rm.group(1))
                    if self.store is not None:
                        self.store.rename_table(spec, new)
                    self.catalog.rename_table(database, schema, table, new)
                    return "table-renamed"
                raise ValueError(f"unparsable RENAME: {rest!r}")

            if verb == "alter":
                cm = re.match(rf"(column\s+)?({_IDENT})\s+(set\s+data\s+)?type\s+(.+)$", rest, re.IGNORECASE | re.DOTALL)
                if cm:
                    name = _unquote(cm.group(2))
                    new_type = cm.group(4).split(" using ")[0].strip()
                    for c in spec.columns:
                        if c.name == name:
                            c.pg_type = new_type
                    return "column-retyped"
                # SET DEFAULT / DROP DEFAULT / SET NOT NULL … — metadata-only
                return "column-altered-noop"

        raise ValueError(f"executor cannot handle: {sql[:100]}")
