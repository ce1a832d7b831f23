"""DDL classifier + schema rewriter — the replay-path decision table.

Reimplements the semantics of the reference's runtime DDL handler
(replayer/connemara_rewrite.pm:30-130 — itself regex-based, so a regex
decision table here is true to form, not a shortcut):

- kill-switch: a COMMENT statement containing 'KILL_ME' aborts the pipeline
  (replay.pl:294-298, F7)
- md5 blocklist: statements whose md5 is listed are skipped
  (connemara_rewrite.pm:30-43)
- SKIP (never replayed): temp tables (:44-47), extensions (:49-52),
  en/disable trigger (:53-56), ADD CHECK (:57-60,65-68), row-level security
  (:61-64), VALIDATE CONSTRAINT (:69-72), OWNER TO (:73-76), functions
  (:77-80), COMMENT ON (:88-91)
- REWRITE + EXECUTE (schema names remapped `<schema>` → `<db>_<schema>`):
  views (:81-87), tables incl. SET SCHEMA (:92-99), types (:100-105),
  sequences (:106-111)
- DROP CONSTRAINT gains IF EXISTS (:117-128)
- anything unknown raises (:112-116) — fail-fast like the reference

Plus the search_path fixer (connemara_rewrite.pm:145-157): drop `"$user"`,
prefix every entry with `<db>_`.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from enum import Enum


class KillSwitch(Exception):
    """COMMENT ... KILL_ME sentinel — the operator asked the pipeline to die."""


class UnknownStatementError(Exception):
    """Unclassifiable DDL — fail fast (connemara_rewrite.pm:112-116)."""


class DDLAction(Enum):
    SKIP = "skip"
    EXECUTE = "execute"


@dataclass
class DDLDecision:
    action: DDLAction
    reason: str
    sql: str | None = None  # rewritten SQL when action == EXECUTE
    object_kind: str | None = None  # table / view / type / sequence


_WS = r"[\s]+"


def _match(pattern: str, sql: str) -> re.Match | None:
    return re.match(pattern, sql, re.IGNORECASE | re.DOTALL)


# Qualified name: schema.name with optional quoting on either part.
_QNAME = r'(?:("?)(?P<schema>[A-Za-z_][\w$]*|"(?:[^"]|"")+")\1\.)?(?P<name>[A-Za-z_][\w$]*|"(?:[^"]|"")+")'


def _unquote(ident: str) -> str:
    if ident.startswith('"') and ident.endswith('"'):
        return ident[1:-1].replace('""', '"')
    return ident


def quote_ident(ident: str) -> str:
    """PG-compatible identifier quoting (quote_ident analog,
    connemara_reindex.sh:51)."""
    if re.fullmatch(r"[a-z_][a-z0-9_$]*", ident):
        return ident
    return '"' + ident.replace('"', '""') + '"'


def rewrite_schema_names(sql: str, database: str, known_schemas: set[str] | None = None) -> str:
    """Prefix schema qualifiers with `<database>_` in a DDL statement.

    The reference's regex rewrite (connemara_rewrite.pm:92-111) rewrites the
    `schema.` qualifier of object names. We rewrite every `ident.` token that
    is (a) in the known-schemas set if given, else (b) any unquoted
    schema-looking qualifier — skipping string literals.
    """
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                elif sql[j] == "'":
                    break
                else:
                    j += 1
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        m = re.match(r'([A-Za-z_][\w$]*|"(?:[^"]|"")+")\s*\.', sql[i:])
        if m:
            schema = _unquote(m.group(1))
            prev = out[-1][-1] if out and out[-1] else " "
            # don't rewrite `alias.` after a dot (three-part names handled
            # by the first match already being db-prefixed)
            if (known_schemas is None or schema in known_schemas) and prev != ".":
                remapped = f"{database}_{schema}"
                out.append(quote_ident(remapped))
                out.append(sql[i + len(m.group(1)) : i + m.end() - 1])  # whitespace
                out.append(".")
                i += m.end()
                continue
        out.append(c)
        i += 1
    return "".join(out)


def fix_search_path(search_path: str, database: str) -> str:
    """Drop `"$user"`, prefix every entry with `<db>_`
    (connemara_rewrite.pm:145-157)."""
    parts = [p.strip() for p in search_path.split(",")]
    fixed = []
    for p in parts:
        if not p or _unquote(p) == "$user":
            continue
        fixed.append(quote_ident(f"{database}_{_unquote(p)}"))
    return ", ".join(fixed)


def statement_md5(sql: str) -> str:
    return hashlib.md5(sql.encode()).hexdigest()


def classify_ddl(
    sql: str,
    database: str,
    *,
    known_schemas: set[str] | None = None,
    md5_blocklist: set[str] | None = None,
) -> DDLDecision:
    """Classify one DDL statement per the reference's decision table."""
    s = sql.strip().rstrip(";").strip()

    # kill-switch FIRST (replay.pl:294-298): even though COMMENTs are
    # normally skipped, the sentinel aborts the daemon.
    if _match(r"COMMENT\b", s) and "KILL_ME" in s:
        raise KillSwitch(s)

    if md5_blocklist and statement_md5(s) in md5_blocklist:
        return DDLDecision(DDLAction.SKIP, "md5-blocklist")

    skip_rules: list[tuple[str, str]] = [
        (r"CREATE{ws}(GLOBAL{ws}|LOCAL{ws})?(TEMP|TEMPORARY){ws}TABLE\b", "temp table"),
        (r"(CREATE|ALTER|DROP){ws}EXTENSION\b", "extension"),
        (r"ALTER{ws}TABLE{ws}.*{ws}(ENABLE|DISABLE){ws}(ALWAYS{ws}|REPLICA{ws})?(TRIGGER|RULE)\b", "trigger toggle"),
        (r"ALTER{ws}TABLE{ws}.*{ws}ADD{ws}(CONSTRAINT{ws}.*{ws})?CHECK\b", "add check"),
        (r"ALTER{ws}TABLE{ws}.*{ws}(ENABLE|DISABLE|FORCE|NO{ws}FORCE){ws}ROW{ws}LEVEL{ws}SECURITY\b", "row level security"),
        (r"ALTER{ws}TABLE{ws}.*{ws}VALIDATE{ws}CONSTRAINT\b", "validate constraint"),
        (r"ALTER{ws}.*{ws}OWNER{ws}TO\b", "owner to"),
        (r"(CREATE({ws}OR{ws}REPLACE)?|ALTER|DROP){ws}(FUNCTION|PROCEDURE)\b", "function"),
        (r"COMMENT{ws}ON\b", "comment"),
        (r"(CREATE|ALTER|DROP){ws}(EVENT{ws})?TRIGGER\b", "trigger"),
        (r"(GRANT|REVOKE)\b", "grant"),
        (r"(CREATE|ALTER|DROP){ws}POLICY\b", "policy"),
        (r"(CREATE|DROP){ws}INDEX\b", "index"),
        (r"ALTER{ws}INDEX\b", "index"),
        (r"SET\b", "session set"),
        (r"(CREATE|ALTER|DROP){ws}SCHEMA\b", "schema ddl"),
    ]
    for pat, reason in skip_rules:
        if _match(pat.replace("{ws}", _WS), s):
            return DDLDecision(DDLAction.SKIP, reason)

    exec_rules: list[tuple[str, str]] = [
        (r"CREATE({ws}OR{ws}REPLACE)?{ws}(MATERIALIZED{ws})?VIEW\b", "view"),
        (r"(ALTER|DROP){ws}(MATERIALIZED{ws})?VIEW\b", "view"),
        (r"CREATE({ws}UNLOGGED)?{ws}TABLE\b", "table"),
        (r"(ALTER|DROP){ws}TABLE\b", "table"),
        (r"(CREATE|ALTER|DROP){ws}TYPE\b", "type"),
        (r"(CREATE|ALTER|DROP){ws}SEQUENCE\b", "sequence"),
        (r"TRUNCATE\b", "table"),
    ]
    for pat, kind in exec_rules:
        if _match(pat.replace("{ws}", _WS), s):
            rewritten = rewrite_schema_names(s, database, known_schemas)
            # DROP CONSTRAINT gains IF EXISTS (connemara_rewrite.pm:117-128)
            rewritten = re.sub(
                r"(DROP\s+CONSTRAINT\s+)(?!IF\s+EXISTS)",
                r"\1IF EXISTS ",
                rewritten,
                flags=re.IGNORECASE,
            )
            return DDLDecision(DDLAction.EXECUTE, kind, sql=rewritten, object_kind=kind)

    raise UnknownStatementError(s.split(None, 4)[:4].__str__() + " …: " + s[:120])
