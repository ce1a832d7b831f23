"""PostgreSQL-compatible scalar function vocabulary (SURVEY §2.6).

Every scalar the reference's generated / introspection SQL relies on,
re-expressed as a native Catalyst ``Column`` expression — no Python UDFs, so
all of these stay inside whole-stage codegen at any scale.

Reference call sites (read-only study of peopledoc/connemara):
- per-column casts ``(payload#>>'{columnvalues,i}')::type`` — replayer/connemara_replay.pl:148
- ``decode(..., 'hex')`` for bytea — replayer/connemara_replay.pl:149-153
- ``md5(db || schema || table || pk)`` worker routing — replayer/connemara_replay.pl:942-959
- ``extract(epoch from xid_timestamp)`` — replayer/connemara_replay.pl:820
- PG-epoch (2000-01-01) microsecond timestamps — connemara_replication/src/connemara_replication.h:19-22
- LSN text ``%X/%X`` → uint64 — connemara_replication/src/connemara_replication.c:207-215
- ``quote_ident`` in generated DDL — replayer/connemara_reindex.sh:51
- PG text-array literal parse ``{A,B}`` — replayer/connemara_replay.pl:300-309
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Microseconds between the PostgreSQL epoch (2000-01-01) and the Unix epoch
# (1970-01-01): 30 years incl. 7 leap days (connemara_replication.h:19-22).
PG_EPOCH_OFFSET_US = 946_684_800_000_000


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pg_cast(value: str | Column, pg_type: str) -> Column:
    """Cast a wal2json string value to the Spark type for a PG type name.

    The apply-side analog of the reference's generated ``::coltype`` casts
    (replay.pl:148). ``bytea`` values arrive as ``\\x``-prefixed hex and
    decode via ``unhex`` (replay.pl:149-153). NULL stays NULL through every
    branch.
    """
    from connemara_spark.catalog import pg_type_to_spark

    v = _col(value)
    base = pg_type.lower().strip()
    if base.startswith("bytea"):
        return decode_hex(v)
    if base in ("bool", "boolean"):
        # PG emits 't'/'f' in some paths, 'true'/'false' in wal2json.
        return (
            F.when(v.isNull(), F.lit(None).cast("boolean"))
            .when(F.lower(v).isin("t", "true", "1"), F.lit(True))
            .when(F.lower(v).isin("f", "false", "0"), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
    return v.cast(pg_type_to_spark(pg_type))


def decode_hex(value: str | Column) -> Column:
    """``decode(x, 'hex')`` — bytea from ``\\x``-prefixed or bare hex text
    (replay.pl:149-153)."""
    v = _col(value)
    return F.unhex(F.regexp_replace(v, r"^\\x", ""))


def routing_hash(*cols: str | Column, buckets: int) -> Column:
    """The reference's md5-mod worker routing (replay.pl:942-959) as an
    expression: ``abs(hash128(md5(concat_ws(...)))) % buckets``.

    Used only for parity/testing — Spark's own hash partitioning replaces it
    in the engine (HashPartitioning on the same key columns).
    """
    joined = F.concat_ws("\x00", *[_col(c).cast("string") for c in cols])
    # md5 → take 15 hex chars (60 bits, fits a long) → mod, mirroring the
    # Perl hex(substr(md5_hex, 0, 15)) % n idiom without copying it.
    return F.pmod(F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("bigint"), F.lit(buckets))


def extract_epoch(ts: str | Column) -> Column:
    """``extract(epoch from ts)`` (replay.pl:820) → seconds as double.

    NTZ-safe: Spark 4 forbids ``CAST(timestamp_ntz AS DOUBLE)`` and the
    driver's parquet timestamps are naive micros (read as TIMESTAMP_NTZ under
    a bare session). Route through an LTZ cast (session tz is pinned UTC by
    the loaders, so naive wall-clock == UTC instant, matching DuckDB's
    ``epoch(ts)`` on naive timestamps) and take exact microseconds.
    """
    t = _col(ts)
    return F.unix_micros(t.cast("timestamp")) / F.lit(1_000_000.0)


def to_pg_epoch_us(ts: str | Column) -> Column:
    """Unix timestamp → PostgreSQL-epoch microseconds
    (connemara_replication.h:19-22, connemara_replication.c:140-157).

    NTZ-safe like ``extract_epoch``: exact micros via unix_micros on an LTZ
    cast, never a direct timestamp→decimal cast (illegal for TIMESTAMP_NTZ).
    """
    t = _col(ts)
    return F.unix_micros(t.cast("timestamp")) - F.lit(PG_EPOCH_OFFSET_US)


def from_pg_epoch_us(us: str | Column) -> Column:
    """PostgreSQL-epoch microseconds → TimestampType."""
    u = _col(us)
    return F.timestamp_micros(u + F.lit(PG_EPOCH_OFFSET_US))


def parse_lsn(lsn_text: str | Column) -> Column:
    """``%X/%X`` WAL position text → uint64 as bigint
    (connemara_replication.c:207-215): ``hi << 32 | lo``."""
    t = _col(lsn_text)
    hi = F.conv(F.split(t, "/").getItem(0), 16, 10).cast("bigint")
    lo = F.conv(F.split(t, "/").getItem(1), 16, 10).cast("bigint")
    return F.shiftleft(hi, 32) + lo


def format_lsn(lsn: str | Column) -> Column:
    """bigint LSN → canonical ``%X/%X`` text."""
    v = _col(lsn).cast("bigint")
    hi = F.upper(F.conv(F.shiftrightunsigned(v, 32).cast("string"), 10, 16))
    lo = F.upper(F.conv(v.bitwiseAND(F.lit(0xFFFFFFFF)).cast("string"), 10, 16))
    return F.concat(hi, F.lit("/"), lo)


def quote_ident(name: str | Column) -> Column:
    """PostgreSQL ``quote_ident`` (connemara_reindex.sh:51): double-quote,
    doubling embedded quotes. Always quotes (safe superset)."""
    n = _col(name)
    return F.concat(F.lit('"'), F.regexp_replace(n, '"', '""'), F.lit('"'))


def quote_ident_py(name: str) -> str:
    """Driver-side ``quote_ident`` for generated Spark SQL (backtick dialect)."""
    return "`" + name.replace("`", "``") + "`"


def parse_pg_text_array(value: str | Column) -> Column:
    """PG text-array literal ``{A,"B,C"}`` → array<string>
    (command_tags parse, replay.pl:300-309).

    Handles the unquoted/quoted element forms the event trigger emits;
    embedded commas inside quoted elements are supported via regexp
    extraction of quoted or bare tokens.
    """
    v = _col(value)
    inner = F.regexp_replace(v, r"^\{|\}$", "")
    # regexp_extract_all over quoted-or-bare tokens; strip quotes + unescape.
    toks = F.regexp_extract_all(inner, F.lit('("([^"\\\\]|\\\\.)*"|[^,]+)'), 0)
    return F.transform(
        toks,
        lambda t: F.when(
            t.startswith('"'),
            F.regexp_replace(F.regexp_replace(t.substr(F.lit(2), F.length(t) - 2), r'\\\\(.)', "$1"), '""', '"'),
        ).otherwise(t),
    )


def json_field(payload: str | Column, path: str) -> Column:
    """``payload ->> 'k'`` / ``#>> '{a,b}'`` analog (replay.pl:432-444):
    dotted/bracketed path over a JSON string via ``get_json_object``."""
    p = path if path.startswith("$") else "$." + path
    return F.get_json_object(_col(payload), p)
