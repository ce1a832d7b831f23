"""DDL subsystem: splitter states, classifier decision table, executor."""

from __future__ import annotations

import pytest

from connemara_spark.catalog import ColumnSpec, EngineCatalog, TableSpec
from connemara_spark.ddl import (
    DDLAction,
    KillSwitch,
    UnknownStatementError,
    classify_ddl,
    fix_search_path,
    rewrite_schema_names,
    split_statements,
)
from connemara_spark.ddl.executor import DDLExecutor, parse_create_table
from connemara_spark.pipeline import parse_command_tags


# --- splitter (FIXTURES.md F5 corpus) ---

def test_split_semicolon_in_literal():
    out = split_statements("INSERT INTO t VALUES (';x;'); SELECT 1;")
    assert len(out) == 2


def test_split_dollar_quote():
    s = "CREATE FUNCTION f() AS $fn$ select 1; select 2; $fn$ LANGUAGE sql; SELECT 3;"
    out = split_statements(s)
    assert len(out) == 2
    assert "$fn$" in out[0].text


def test_split_nested_block_comments():
    out = split_statements("/* a /* b; */ c; */ SELECT 1; SELECT 2;")
    assert len(out) == 2
    assert out[0].stripped().endswith("SELECT 1;")


def test_split_line_comment_and_psql():
    out = split_statements("-- c;omment\nSELECT 1;\n\\connect foo\nSELECT 2;")
    assert [o.is_psql for o in out] == [False, True, False]


def test_split_quoted_identifier():
    out = split_statements('SELECT ";" FROM "we;ird"; SELECT 1;')
    assert len(out) == 2


def test_split_escaped_literal():
    out = split_statements("SELECT E'a\\'; b'; SELECT 2;")
    assert len(out) == 2


# --- classifier decision table (connemara_rewrite.pm:33-130 semantics) ---

EXEC_CASES = [
    ("CREATE TABLE public.t2 (id int)", "CREATE TABLE db1_public.t2 (id int)"),
    ("ALTER TABLE public.customer ADD COLUMN note text", "ALTER TABLE db1_public.customer ADD COLUMN note text"),
    ("DROP TABLE public.t2", "DROP TABLE db1_public.t2"),
    ("CREATE SEQUENCE public.s1", "CREATE SEQUENCE db1_public.s1"),
    ("CREATE TYPE public.mood AS ENUM ('a','b')", "CREATE TYPE db1_public.mood AS ENUM ('a','b')"),
    ("CREATE VIEW public.v1 AS SELECT * FROM public.t1", "CREATE VIEW db1_public.v1 AS SELECT * FROM db1_public.t1"),
]


@pytest.mark.parametrize("sql,expected", EXEC_CASES)
def test_classify_execute_and_rewrite(sql, expected):
    d = classify_ddl(sql, "db1", known_schemas={"public"})
    assert d.action == DDLAction.EXECUTE
    assert d.sql == expected


SKIP_CASES = [
    "CREATE TEMP TABLE tt (x int)",
    "CREATE TEMPORARY TABLE tt (x int)",
    "CREATE EXTENSION IF NOT EXISTS hstore",
    "ALTER TABLE t ENABLE TRIGGER trg",
    "ALTER TABLE t DISABLE TRIGGER ALL",
    "ALTER TABLE t ADD CHECK (x > 0)",
    "ALTER TABLE t ADD CONSTRAINT c CHECK (x > 0)",
    "ALTER TABLE t ENABLE ROW LEVEL SECURITY",
    "ALTER TABLE t VALIDATE CONSTRAINT c",
    "ALTER TABLE t OWNER TO bob",
    "CREATE FUNCTION f() RETURNS int AS $$ SELECT 1 $$ LANGUAGE sql",
    "CREATE OR REPLACE FUNCTION f() RETURNS int AS $$ SELECT 1 $$ LANGUAGE sql",
    "COMMENT ON TABLE t IS 'x'",
    "GRANT SELECT ON t TO bob",
    "CREATE INDEX idx ON t (x)",
]


@pytest.mark.parametrize("sql", SKIP_CASES)
def test_classify_skip(sql):
    assert classify_ddl(sql, "db1").action == DDLAction.SKIP


def test_drop_constraint_gains_if_exists():
    d = classify_ddl("ALTER TABLE public.c DROP CONSTRAINT c_chk", "db1", known_schemas={"public"})
    assert "DROP CONSTRAINT IF EXISTS c_chk" in d.sql


def test_unknown_raises():
    with pytest.raises(UnknownStatementError):
        classify_ddl("CLUSTER foo USING bar", "db1")


def test_kill_switch():
    with pytest.raises(KillSwitch):
        classify_ddl("COMMENT ON TABLE t IS 'KILL_ME'", "db1")


def test_md5_blocklist():
    from connemara_spark.ddl.rewriter import statement_md5

    sql = "DROP TABLE public.t2"
    d = classify_ddl(sql, "db1", md5_blocklist={statement_md5(sql)})
    assert d.action == DDLAction.SKIP and d.reason == "md5-blocklist"


def test_search_path_fixer():
    assert fix_search_path('"$user", public', "db1") == "db1_public"
    assert fix_search_path("public, audit", "mydb") == "mydb_public, mydb_audit"


def test_rewrite_skips_string_literals():
    out = rewrite_schema_names(
        "SELECT nextval('public.seq1'::regclass) FROM public.t", "db1", {"public"}
    )
    # literal untouched (regclass-literal rewrite is a separate basebackup
    # concern), table qualifier rewritten
    assert "FROM db1_public.t" in out
    assert "'public.seq1'" in out


def test_parse_command_tags():
    assert parse_command_tags('{COMMENT,"ALTER TABLE"}') == ["COMMENT", "ALTER TABLE"]
    assert parse_command_tags("{}") == []
    assert parse_command_tags('{"CREATE TABLE"}') == ["CREATE TABLE"]


# --- create-table parser + executor ---

def test_parse_create_table_inline_pk():
    p = parse_create_table(
        'CREATE TABLE db1_public.t2 (id bigint PRIMARY KEY, "v x" varchar(10) NOT NULL, w numeric(10,2) DEFAULT 0)'
    )
    assert p.table == "t2"
    assert [c.name for c in p.columns] == ["id", "v x", "w"]
    assert [c.pg_type for c in p.columns] == ["bigint", "varchar(10)", "numeric(10,2)"]
    assert p.pk_cols == ["id"]


def test_parse_create_table_table_level_pk_and_unique():
    p = parse_create_table(
        "CREATE TABLE s.t (a int, b int, c text, PRIMARY KEY (a, b), UNIQUE (c))"
    )
    assert p.pk_cols == ["a", "b"]
    assert p.has_extra_unique


def test_executor_lifecycle():
    cat = EngineCatalog()
    ex = DDLExecutor(cat)

    def run(sql):
        return ex.execute(classify_ddl(sql, "db1", known_schemas={"public"}), "db1")

    assert run("CREATE TABLE public.t2 (id int PRIMARY KEY, v text)") == "table-created"
    spec = cat.get("db1", "public", "t2")
    assert spec.pk_cols == ["id"]

    assert run("ALTER TABLE public.t2 ADD COLUMN note text") == "column-added"
    assert "note" in cat.get("db1", "public", "t2").column_names

    assert run("ALTER TABLE public.t2 RENAME COLUMN note TO memo") == "column-renamed"
    assert "memo" in cat.get("db1", "public", "t2").column_names

    assert run("ALTER TABLE public.t2 DROP COLUMN memo") == "column-dropped"
    assert "memo" not in cat.get("db1", "public", "t2").column_names

    assert run("ALTER TABLE public.t2 RENAME TO t3") == "table-renamed"
    assert cat.maybe_get("db1", "public", "t2") is None
    assert cat.get("db1", "public", "t3") is not None

    assert run("DROP TABLE public.t3") == "table-dropped"
    assert run("DROP TABLE public.never_existed") == "drop-missing-tolerated"

def test_executor_add_constraint_not_a_column():
    """ALTER TABLE ADD CONSTRAINT/PRIMARY/FOREIGN/UNIQUE must not be parsed
    as ADD COLUMN (phantom 'CONSTRAINT' column corrupting later applies)."""
    cat = EngineCatalog()
    ex = DDLExecutor(cat)

    def run(sql):
        return ex.execute(classify_ddl(sql, "db1", known_schemas={"public"}), "db1")

    run("CREATE TABLE public.t4 (id int, v text)")
    spec = cat.get("db1", "public", "t4")
    assert spec.pk_cols == []

    assert run("ALTER TABLE public.t4 ADD CONSTRAINT t4_pk PRIMARY KEY (id)") == "pk-added"
    assert cat.get("db1", "public", "t4").pk_cols == ["id"]
    assert run("ALTER TABLE public.t4 ADD PRIMARY KEY (id, v)") == "pk-added"
    assert cat.get("db1", "public", "t4").pk_cols == ["id", "v"]
    assert run("ALTER TABLE public.t4 ADD CONSTRAINT t4_uq UNIQUE (v)") == "unique-added"
    assert cat.get("db1", "public", "t4").has_extra_unique
    assert (
        run("ALTER TABLE public.t4 ADD CONSTRAINT t4_fk FOREIGN KEY (id) REFERENCES public.t4 (id)")
        == "constraint-noop"
    )
    # no phantom columns appeared
    assert cat.get("db1", "public", "t4").column_names == ["id", "v"]


def test_executor_create_sequence_if_not_exists_name():
    cat = EngineCatalog()
    ex = DDLExecutor(cat)

    def run(sql):
        return ex.execute(classify_ddl(sql, "db1", known_schemas={"public"}), "db1")

    run("CREATE SEQUENCE IF NOT EXISTS public.seq9")
    assert not any(s in ("if", "IF") for s in ex.sequences)
    assert any("seq9" in s for s in ex.sequences)
