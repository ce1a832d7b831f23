"""Golden tests for the basebackup-path schema remapper
(connemara_spark/ddl/remap.py), mirroring the reference's AST remapper
cases (connemara_python/connemara/sqlparser/remappers.py)."""

from __future__ import annotations

import pytest

from connemara_spark.ddl.remap import remap_script, remap_statement, tokenize

MAP = {"public": "db1_public", "app": "db1_app"}


# ---------------------------------------------------------------------------
# regclass literals (remappers.py:468-494)
# ---------------------------------------------------------------------------


def test_regclass_literal_in_nextval_default():
    sql = (
        "CREATE TABLE public.t1 (id integer DEFAULT "
        "nextval('public.seq1'::regclass) NOT NULL)"
    )
    out = remap_statement(sql, MAP)
    assert "nextval('db1_public.seq1'::regclass)" in out
    assert out.startswith("CREATE TABLE db1_public.t1")


def test_regclass_literal_pg_catalog_qualified():
    sql = "SELECT nextval('app.s'::pg_catalog.regclass)"
    assert "'db1_app.s'" in remap_statement(sql, MAP)


def test_regclass_cast_function_form():
    sql = "SELECT nextval(CAST('public.seq1' AS regclass))"
    assert "CAST('db1_public.seq1' AS regclass)" in remap_statement(sql, MAP)


def test_plain_string_literals_untouched():
    sql = "INSERT INTO public.t VALUES ('public.seq1', 'not.a.cast')"
    out = remap_statement(sql, MAP)
    assert "'public.seq1'" in out  # literal NOT followed by ::regclass
    assert "'not.a.cast'" in out
    assert "INSERT INTO db1_public.t" in out


def test_regclass_literal_quoted_schema_inside():
    sql = """SELECT 'app."Seq"'::regclass"""
    assert "'db1_app.\"Seq\"'" in remap_statement(sql, MAP)


def test_regclass_unmapped_schema_untouched():
    sql = "SELECT nextval('other.seq'::regclass)"
    assert "'other.seq'" in remap_statement(sql, MAP)


def test_regclass_strip_schema_when_mapped_to_none():
    sql = "SELECT nextval('public.seq1'::regclass)"
    assert "nextval('seq1'::regclass)" in remap_statement(sql, {"public": None})


# ---------------------------------------------------------------------------
# SQL-language function bodies (remappers.py:355-381)
# ---------------------------------------------------------------------------


def test_sql_function_body_dollar_quoted():
    sql = (
        "CREATE FUNCTION public.getcount() RETURNS bigint LANGUAGE sql AS "
        "$$ SELECT count(*) FROM public.t1 $$"
    )
    out = remap_statement(sql, MAP)
    assert "CREATE FUNCTION db1_public.getcount()" in out
    assert "FROM db1_public.t1" in out


def test_sql_function_body_standard_string():
    sql = (
        "CREATE OR REPLACE FUNCTION app.f() RETURNS int LANGUAGE sql "
        "AS 'SELECT max(id) FROM app.items'"
    )
    out = remap_statement(sql, MAP)
    assert "FROM db1_app.items" in out


def test_sql_function_body_with_regclass_inside():
    sql = (
        "CREATE FUNCTION public.nx() RETURNS bigint LANGUAGE sql AS "
        "$$ SELECT nextval('public.seq1'::regclass) $$"
    )
    assert "nextval('db1_public.seq1'::regclass)" in remap_statement(sql, MAP)


def test_plpgsql_function_body_left_alone():
    body = "BEGIN RETURN (SELECT count(*) FROM public.t1); END"
    sql = (
        f"CREATE FUNCTION public.g() RETURNS bigint LANGUAGE plpgsql AS ${'b'}${body}${'b'}$"
    )
    out = remap_statement(sql, MAP)
    # the reference logs a warning and does not rewrite non-SQL bodies
    assert "FROM public.t1" in out
    assert "CREATE FUNCTION db1_public.g()" in out  # name still remapped


def test_language_clause_before_as():
    sql = "CREATE FUNCTION public.f() RETURNS int LANGUAGE SQL AS $$SELECT 1 FROM public.t$$"
    assert "FROM db1_public.t" in remap_statement(sql, MAP)


# ---------------------------------------------------------------------------
# GRANT ON SCHEMA (remappers.py:269-288)
# ---------------------------------------------------------------------------


def test_grant_on_schema():
    sql = "GRANT USAGE ON SCHEMA public, app TO some_role"
    out = remap_statement(sql, MAP)
    assert "SCHEMA db1_public, db1_app TO some_role" in out


def test_revoke_on_schema():
    sql = "REVOKE ALL ON SCHEMA app FROM other_role"
    out = remap_statement(sql, MAP)
    assert "SCHEMA db1_app FROM other_role" in out


def test_grant_on_table_remaps_qualifier_only():
    sql = "GRANT SELECT ON TABLE public.t1 TO reader"
    out = remap_statement(sql, MAP)
    assert "ON TABLE db1_public.t1 TO reader" in out


# ---------------------------------------------------------------------------
# ALTER SEQUENCE OWNED BY (remappers.py:316-327)
# ---------------------------------------------------------------------------


def test_alterseq_owned_by():
    sql = "ALTER SEQUENCE public.seq1 OWNED BY public.t1.id"
    out = remap_statement(sql, MAP)
    assert out == "ALTER SEQUENCE db1_public.seq1 OWNED BY db1_public.t1.id"


def test_alterseq_owned_by_none():
    sql = "ALTER SEQUENCE public.seq1 OWNED BY NONE"
    assert remap_statement(sql, MAP) == "ALTER SEQUENCE db1_public.seq1 OWNED BY NONE"


# ---------------------------------------------------------------------------
# CREATE SCHEMA + general shapes
# ---------------------------------------------------------------------------


def test_create_schema():
    assert remap_statement("CREATE SCHEMA app", MAP) == "CREATE SCHEMA db1_app"
    assert (
        remap_statement("CREATE SCHEMA IF NOT EXISTS public AUTHORIZATION owner1", MAP)
        == "CREATE SCHEMA IF NOT EXISTS db1_public AUTHORIZATION owner1"
    )


def test_quoted_schema_qualifier():
    sql = 'ALTER TABLE "public".t1 ADD COLUMN c int'
    assert remap_statement(sql, MAP) == "ALTER TABLE db1_public.t1 ADD COLUMN c int"


def test_qualifier_strip_to_none():
    sql = "SELECT * FROM public.t1"
    assert remap_statement(sql, {"public": None}) == "SELECT * FROM t1"


def test_default_schema_qualifies_unqualified_head():
    sql = "CREATE TABLE t1 (id int)"
    out = remap_statement(sql, MAP, default_schema="public")
    assert out == "CREATE TABLE db1_public.t1 (id int)"


def test_default_schema_leaves_qualified_head():
    sql = "CREATE TABLE app.t1 (id int)"
    out = remap_statement(sql, MAP, default_schema="public")
    assert out == "CREATE TABLE db1_app.t1 (id int)"


def test_comments_and_strings_protected():
    sql = (
        "-- public.t1 in a comment\n"
        "/* public.x */ SELECT 'public.y', public.t1.c FROM public.t1"
    )
    out = remap_statement(sql, MAP)
    assert "-- public.t1 in a comment" in out
    assert "/* public.x */" in out
    assert "'public.y'" in out
    assert "db1_public.t1.c" in out


def test_remap_script_multi_statement():
    script = (
        "CREATE SCHEMA app;\n"
        "CREATE TABLE app.t (id int DEFAULT nextval('app.s'::regclass));\n"
    )
    out = remap_script(script, MAP)
    assert "CREATE SCHEMA db1_app" in out
    assert "nextval('db1_app.s'::regclass)" in out


def test_tokenizer_roundtrip():
    sql = (
        "SELECT e'it''s', $tag$ body $tag$, \"Qi\", 1.5e3, a::int -- c\n"
        "/* b */ FROM t"
    )
    assert "".join(t.text for t in tokenize(sql)) == sql


def test_dollar_body_delimiter_collision():
    # body contains $$ after remap → re-embedded with a fresh tag
    sql = (
        "CREATE FUNCTION public.f() RETURNS text LANGUAGE sql AS "
        "$fn$ SELECT '$$' FROM public.t $fn$"
    )
    out = remap_statement(sql, MAP)
    assert "FROM db1_public.t" in out
    # still parses as one statement: tokenize finds exactly one DOLLAR token
    assert sum(1 for t in tokenize(out) if t.kind == "DOLLAR") == 1


# ---------------------------------------------------------------------------
# bare-name schema statements: DROP/ALTER/COMMENT ON SCHEMA, SET search_path
# (remappers.py:249-257 remap_variable; GrantStmt-adjacent bare-name cases)
# ---------------------------------------------------------------------------


def test_drop_schema_if_exists_list():
    got = remap_statement("DROP SCHEMA IF EXISTS public, app CASCADE;", MAP)
    assert got == "DROP SCHEMA IF EXISTS db1_public, db1_app CASCADE;"


def test_alter_schema_rename_remaps_only_old_name():
    got = remap_statement("ALTER SCHEMA app RENAME TO app2;", MAP)
    assert got == "ALTER SCHEMA db1_app RENAME TO app2;"


def test_alter_schema_owner():
    got = remap_statement("ALTER SCHEMA public OWNER TO admin;", MAP)
    assert got == "ALTER SCHEMA db1_public OWNER TO admin;"


def test_comment_on_schema():
    got = remap_statement("COMMENT ON SCHEMA public IS 'standard public schema';", MAP)
    assert got == "COMMENT ON SCHEMA db1_public IS 'standard public schema';"


def test_set_search_path_bare_names():
    got = remap_statement('SET search_path = public, app, "$user";', MAP)
    assert got == 'SET search_path = db1_public, db1_app, "$user";'


def test_set_search_path_to_strings():
    got = remap_statement("SET LOCAL search_path TO 'public', 'unmapped';", MAP)
    assert got == "SET LOCAL search_path TO 'db1_public', 'unmapped';"


def test_set_other_variable_untouched():
    sql = "SET statement_timeout = 0;"
    assert remap_statement(sql, MAP) == sql
