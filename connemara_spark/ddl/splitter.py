"""SQL statement splitter — a streaming state machine.

Semantics match the reference's splitter (connemara_python/connemara/
sqlparser/parser.py:53-267): a script is cut into statements at top-level
semicolons while tracking these states:

- plain SQL
- 'single-quoted literals' (with '' escapes and E'\\' backslash escapes)
- "quoted identifiers"
- $tag$ dollar-quoted strings $tag$
- -- line comments
- /* block comments, which NEST */
- \\psql backslash commands (own line, end at newline)

Implementation is original (character scanner, no regexes on the hot loop).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Statement:
    text: str
    start_line: int
    is_psql: bool = False

    def stripped(self) -> str:
        return self.text.strip()


def split_statements(script: str, *, keep_empty: bool = False) -> list[Statement]:
    """Split a SQL script into statements, preserving comments in place."""
    out: list[Statement] = []
    buf: list[str] = []
    i, n = 0, len(script)
    line = 1
    stmt_start_line = 1
    state = "plain"
    dollar_tag = ""
    block_depth = 0
    prev_backslash_escape = False
    content_seen = False

    def flush(is_psql: bool = False) -> None:
        nonlocal buf, stmt_start_line, content_seen
        text = "".join(buf)
        if keep_empty or text.strip():
            out.append(Statement(text, stmt_start_line, is_psql))
        buf = []
        content_seen = False
        stmt_start_line = line

    while i < n:
        c = script[i]
        nxt = script[i + 1] if i + 1 < n else ""

        if c == "\n":
            line += 1

        was_boundary = not content_seen
        if state == "plain" and not content_seen and not c.isspace():
            content_seen = True
            stmt_start_line = line

        if state == "plain":
            if c == "-" and nxt == "-":
                state = "line_comment"
                buf.append(c)
            elif c == "/" and nxt == "*":
                state = "block_comment"
                block_depth = 1
                buf.append(c)
                buf.append(nxt)
                i += 1
            elif c == "'":
                # E'...' style marks backslash-escape mode
                state = "literal"
                prev_backslash_escape = bool(buf) and buf[-1] in ("e", "E")
                buf.append(c)
            elif c == '"':
                state = "ident"
                buf.append(c)
            elif c == "$":
                # try to scan a dollar-quote tag: $tag$ or $$
                j = i + 1
                while j < n and (script[j].isalnum() or script[j] == "_"):
                    j += 1
                if j < n and script[j] == "$":
                    dollar_tag = script[i : j + 1]
                    state = "dollar_quote"
                    buf.append(dollar_tag)
                    i = j
                else:
                    buf.append(c)
            elif c == "\\" and was_boundary:
                state = "psql_command"
                buf.append(c)
            elif c == ";":
                buf.append(c)
                flush()
            else:
                buf.append(c)

        elif state == "line_comment":
            buf.append(c)
            if c == "\n":
                state = "plain"

        elif state == "block_comment":
            buf.append(c)
            if c == "*" and nxt == "/":
                buf.append(nxt)
                i += 1
                block_depth -= 1
                if block_depth == 0:
                    state = "plain"
            elif c == "/" and nxt == "*":
                buf.append(nxt)
                i += 1
                block_depth += 1

        elif state == "literal":
            buf.append(c)
            if c == "\\" and prev_backslash_escape:
                if nxt:
                    buf.append(nxt)
                    i += 1
            elif c == "'":
                if nxt == "'":
                    buf.append(nxt)
                    i += 1
                else:
                    state = "plain"

        elif state == "ident":
            buf.append(c)
            if c == '"':
                if nxt == '"':
                    buf.append(nxt)
                    i += 1
                else:
                    state = "plain"

        elif state == "dollar_quote":
            if c == "$" and script.startswith(dollar_tag, i):
                buf.append(dollar_tag)
                i += len(dollar_tag) - 1
                state = "plain"
            else:
                buf.append(c)

        elif state == "psql_command":
            buf.append(c)
            if c == "\n":
                state = "plain"
                flush(is_psql=True)

        i += 1

    if state == "psql_command":
        flush(is_psql=True)
    else:
        flush()
    return out
