"""Scalar vocabulary tests (SURVEY §2.6): PG-compatible expressions."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from connemara_spark.functions import (
    PG_EPOCH_OFFSET_US,
    decode_hex,
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


def test_parse_and_format_lsn_roundtrip(spark):
    df = spark.createDataFrame(
        [("0/1649C90",), ("16/B374D848",), ("FFFFFFFF/FFFFFFFF",)], ["lsn"]
    ).select(
        parse_lsn("lsn").alias("v"),
        format_lsn(parse_lsn("lsn")).alias("rt"),
    )
    rows = df.collect()
    assert rows[0].v == 0x1649C90
    assert rows[1].v == (0x16 << 32) | 0xB374D848
    # uint64 max stored in a signed bigint wraps to -1 (same 64 bits as the
    # reference's C uint64); the text roundtrip below proves no loss.
    assert rows[2].v == -1
    assert [r.rt for r in rows] == ["0/1649C90", "16/B374D848", "FFFFFFFF/FFFFFFFF"]


def test_pg_epoch_roundtrip(spark):
    df = spark.sql("SELECT timestamp'2026-01-02 03:04:05.123456' AS ts").select(
        to_pg_epoch_us("ts").alias("us"),
        from_pg_epoch_us(to_pg_epoch_us("ts")).cast("string").alias("rt"),
    )
    r = df.collect()[0]
    # 2026-01-02 vs PG epoch 2000-01-01: positive micros, roundtrips exactly.
    assert r.us > 0
    assert r.rt == "2026-01-02 03:04:05.123456"
    # Unix epoch maps to -PG_EPOCH_OFFSET_US.
    r2 = (
        spark.sql("SELECT timestamp'1970-01-01 00:00:00' AS ts")
        .select(to_pg_epoch_us("ts").alias("us"))
        .collect()[0]
    )
    assert r2.us == -PG_EPOCH_OFFSET_US


def test_decode_hex_and_bytea_cast(spark):
    df = spark.createDataFrame([(r"\x48690a",), ("4869",), (None,)], ["b"]).select(
        decode_hex("b").alias("raw"), pg_cast("b", "bytea").alias("casted")
    )
    rows = df.collect()
    assert bytes(rows[0].raw) == b"Hi\n"
    assert bytes(rows[1].raw) == b"Hi"
    assert rows[2].raw is None and rows[2].casted is None


def test_pg_cast_scalars(spark):
    df = spark.createDataFrame(
        [("42", "3.5", "t", "2024-05-06", "12.345")], ["i", "f", "b", "d", "n"]
    ).select(
        pg_cast("i", "integer").alias("i"),
        pg_cast("f", "double precision").alias("f"),
        pg_cast("b", "boolean").alias("b"),
        pg_cast("d", "date").cast("string").alias("d"),
        pg_cast("n", "numeric").alias("n"),
    )
    r = df.collect()[0]
    assert r.i == 42 and abs(r.f - 3.5) < 1e-9 and r.b is True and r.d == "2024-05-06"
    assert float(r.n) == pytest.approx(12.345)


def test_routing_hash_stable_and_bounded(spark):
    df = spark.createDataFrame(
        [("db1", "public", "t", str(i)) for i in range(100)], ["db", "sch", "tbl", "pk"]
    ).select(routing_hash("db", "sch", "tbl", "pk", buckets=4).alias("r"))
    vals = [r.r for r in df.collect()]
    assert all(0 <= v < 4 for v in vals)
    assert len(set(vals)) == 4  # spreads across buckets
    # determinism
    vals2 = [r.r for r in df.collect()]
    assert vals == vals2


def test_quote_ident(spark):
    df = spark.createDataFrame([('we"ird',), ("plain",)], ["n"]).select(quote_ident("n").alias("q"))
    rows = [r.q for r in df.collect()]
    assert rows == ['"we""ird"', '"plain"']
    assert quote_ident_py("a`b") == "`a``b`"


def test_parse_pg_text_array(spark):
    df = spark.createDataFrame(
        [("{CREATE TABLE,ALTER TABLE}",), ('{"has, comma",bare}',), ("{}",)], ["a"]
    ).select(parse_pg_text_array("a").alias("v"))
    rows = [r.v for r in df.collect()]
    assert rows[0] == ["CREATE TABLE", "ALTER TABLE"]
    assert rows[1] == ["has, comma", "bare"]
    assert rows[2] == []


def test_json_field(spark):
    df = spark.createDataFrame(
        [('{"kind":"insert","oldkeys":{"keynames":["id"]}}',)], ["payload"]
    ).select(
        json_field("payload", "kind").alias("kind"),
        json_field("payload", "oldkeys.keynames[0]").alias("k0"),
    )
    r = df.collect()[0]
    assert r.kind == "insert" and r.k0 == "id"
