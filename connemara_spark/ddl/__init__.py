"""DDL subsystem: statement splitting, classification, schema rewriting.

Reimplements the semantics of the reference's two DDL layers (SURVEY §2.7)
from scratch on plain Python — the AST library the reference uses (pglast)
is intentionally NOT a dependency; the executable subset the engine needs
(CREATE/DROP/ALTER TABLE, sequences, types, views) is handled by a
purpose-built tokenizer + regex decision table, mirroring how the
reference's *runtime* layer works (regex-based, replayer/connemara_rewrite.pm).
"""

from connemara_spark.ddl.splitter import split_statements
from connemara_spark.ddl.rewriter import (
    DDLAction,
    DDLDecision,
    KillSwitch,
    UnknownStatementError,
    classify_ddl,
    fix_search_path,
    rewrite_schema_names,
)

__all__ = [
    "split_statements",
    "DDLAction",
    "DDLDecision",
    "KillSwitch",
    "UnknownStatementError",
    "classify_ddl",
    "fix_search_path",
    "rewrite_schema_names",
]
