"""WebDataset-style tar shard sink/source: determinism, roundtrip, routing."""

from __future__ import annotations

import tarfile

from connemara_spark.sources.shards import read_tar_shards, write_tar_shards


def _docs(spark, n=40):
    rows = [(i, f"text body {i}", bytes([i % 256, (i * 7) % 256])) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, payload binary")


def test_shard_write_roundtrip(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = _docs(spark)
    manifest = write_tar_shards(
        df, out, key_col="doc_id", member_cols={"txt": "text", "bin": "payload"}, n_shards=4
    ).collect()
    assert sum(m["n_samples"] for m in manifest) == 40
    assert {m["shard"] for m in manifest} <= {f"shard-{i:06d}.tar" for i in range(4)}

    back = read_tar_shards(spark, out)
    got = {r["key"]: r["members"] for r in back.collect()}
    assert len(got) == 40
    assert got["7"]["txt"].decode() == "text body 7"
    assert got["7"]["bin"] == bytes([7, 49])


def test_shard_bytes_are_deterministic(spark, tmp_path):
    """Two independent writes produce byte-identical shards (retry safety:
    zeroed tar metadata + sorted member order + expression-based routing)."""
    df = _docs(spark)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = {m["shard"]: m["digest"] for m in write_tar_shards(
        df, d1, key_col="doc_id", member_cols={"txt": "text"}, n_shards=3).collect()}
    m2 = {m["shard"]: m["digest"] for m in write_tar_shards(
        df, d2, key_col="doc_id", member_cols={"txt": "text"}, n_shards=3).collect()}
    assert m1 == m2 and len(m1) == 3


def test_shard_col_routing_and_member_grouping(spark, tmp_path):
    """Caller-provided shard assignment (pack_sequences-style bin ids) and
    multi-member samples stay contiguous per basename."""
    df = spark.createDataFrame(
        [(1, 0, "a", '{"n":1}'), (2, 0, "b", '{"n":2}'), (3, 1, "c", '{"n":3}')],
        "doc_id long, bin_id long, text string, meta string",
    )
    out = str(tmp_path / "s")
    manifest = {m["shard"]: m["n_samples"] for m in write_tar_shards(
        df, out, key_col="doc_id", member_cols={"txt": "text", "json": "meta"},
        n_shards=2, shard_col="bin_id").collect()}
    assert manifest == {"shard-000000.tar": 2, "shard-000001.tar": 1}
    # member adjacency inside the tar (the WebDataset contract)
    with tarfile.open(f"{out}/shard-000000.tar") as tar:
        names = [i.name for i in tar]
    # grouped by basename, members in member_cols order
    assert names == ["1.txt", "1.json", "2.txt", "2.json"]


def test_null_members_are_skipped(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, b"\x01")], "doc_id long, text string, payload binary"
    )
    out = str(tmp_path / "s")
    write_tar_shards(
        df, out, key_col="doc_id", member_cols={"txt": "text", "bin": "payload"}, n_shards=1
    ).collect()
    got = {r["key"]: set(r["members"]) for r in read_tar_shards(spark, out).collect()}
    assert got == {"1": {"txt"}, "2": {"bin"}}
