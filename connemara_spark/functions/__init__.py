"""Scalar function vocabulary (SURVEY §2.6): PG-compatible expressions as
native Catalyst Columns — casts, bytea hex, LSN text, PG-epoch timestamps,
md5 routing, quote_ident, PG text-array literals, JSON field access."""

from connemara_spark.functions.pg import (
    PG_EPOCH_OFFSET_US,
    decode_hex,
    extract_epoch,
    format_lsn,
    from_pg_epoch_us,
    json_field,
    parse_lsn,
    parse_pg_text_array,
    pg_cast,
    quote_ident,
    quote_ident_py,
    routing_hash,
    to_pg_epoch_us,
)

__all__ = [
    "PG_EPOCH_OFFSET_US",
    "decode_hex",
    "extract_epoch",
    "format_lsn",
    "from_pg_epoch_us",
    "json_field",
    "parse_lsn",
    "parse_pg_text_array",
    "pg_cast",
    "quote_ident",
    "quote_ident_py",
    "routing_hash",
    "to_pg_epoch_us",
]
