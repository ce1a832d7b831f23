"""WebDataset-style tar shard sink/source for packed training samples.

Large-scale training loaders (WebDataset convention, public: sequential
tar archives where one sample = consecutive members sharing a basename —
``{key}.txt`` + ``{key}.json`` + ...) stream shards sequentially instead
of seeking a filesystem of tiny files. This module writes a DataFrame of
samples into such shards distributively, and reads them back:

- **shard assignment is a deterministic column expression** (xxhash64 of
  the key modulo ``n_shards``, or any caller-provided ``shard_col`` such
  as ``pack_sequences``' bin_id), so a retried task regenerates byte-
  identical shards — no rand(), no task-order dependence.
- **one shuffle**: ``repartition(n_shards, shard)`` routes each shard's
  samples to one task; inside a task samples are written in sorted-key
  order with zeroed tar metadata (mtime/uid/gid/mode pinned), making the
  whole shard byte-reproducible (tested by double-write digest equality).
- **the write is an action on executors** (``mapInPandas`` emitting one
  manifest row per shard) — the driver never sees sample bytes; at 100 TB
  each task streams its shard straight to shared storage.
- the reader walks shard members grouping by basename, re-assembling one
  row per sample — the exact inverse, also executor-side.

Scale note: ``n_shards`` sizes tasks; with ~3 GB/shard and 1000 tasks a
PB-scale corpus writes in bounded memory (tarfile streams member-by-
member; nothing buffers more than one member).
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "shard string, n_samples long, n_bytes long, digest string"
SAMPLE_SCHEMA = "key string, shard string, members map<string,binary>"


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    *,
    key_col: str,
    member_cols: dict[str, str],
    n_shards: int = 16,
    shard_col: str | None = None,
    prefix: str = "shard",
) -> DataFrame:
    """Write samples into WebDataset-style tar shards; returns the manifest
    DataFrame (shard path, sample count, byte size, md5 digest) — collect
    it to force the write (it is the action).

    ``member_cols`` maps member extension -> source column; string columns
    are UTF-8 encoded, binary columns pass through, any other type is JSON
    encoded (the ``.json`` member convention). ``shard_col`` overrides the
    default hash sharding with a precomputed assignment (e.g.
    ``pack_sequences`` bin ids routed one-bin-per-shard).
    """
    os.makedirs(out_dir, exist_ok=True)
    key = F.col(key_col).cast("string").alias("__key")
    shard = (
        F.col(shard_col).cast("long")
        if shard_col
        else F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))
    ).alias("__shard")
    cols = [key, shard] + [
        F.col(src).alias(f"__m_{ext}") for ext, src in member_cols.items()
    ]
    exts = list(member_cols)
    # sortWithinPartitions makes each task's shards CONTIGUOUS and its
    # samples key-ordered, so the writer streams row-by-row with exactly
    # one open tar — memory is one Arrow batch, never a whole shard
    src = (
        df.select(*cols)
        .repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", "__key")
    )

    def write(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        state = {"sid": None, "tar": None, "tmp": None, "path": None, "name": None, "n": 0}
        out = []

        def close_current():
            if state["tar"] is None:
                return
            state["tar"].close()
            os.replace(state["tmp"], state["path"])
            # Stream the manifest digest in 1 MiB chunks — reading the whole
            # finished shard back would allocate shard-size (GBs) per task,
            # defeating the bounded-memory design above.
            digest = hashlib.md5()
            n_bytes = 0
            with open(state["path"], "rb") as fh:
                while chunk := fh.read(1 << 20):
                    digest.update(chunk)
                    n_bytes += len(chunk)
            out.append((state["name"], state["n"], n_bytes, digest.hexdigest()))
            state.update(sid=None, tar=None, n=0)

        for pdf in batches:
            # to_dict (not itertuples): namedtuples positionalize the
            # underscore-prefixed internal column names
            for d in pdf.to_dict(orient="records"):
                sid = int(d["__shard"])
                if sid != state["sid"]:
                    close_current()
                    name = f"{prefix}-{sid:06d}.tar"
                    path = os.path.join(out_dir, name)
                    state.update(
                        sid=sid, name=name, path=path, tmp=path + ".tmp", n=0,
                        tar=tarfile.open(path + ".tmp", "w"),
                    )
                for ext in exts:
                    v = d[f"__m_{ext}"]
                    if v is None:
                        continue
                    if isinstance(v, (bytes, bytearray)):
                        body = bytes(v)
                    elif isinstance(v, str):
                        body = v.encode("utf-8")
                    else:
                        body = json.dumps(v, default=str, sort_keys=True).encode()
                    info = tarfile.TarInfo(name=f"{d['__key']}.{ext}")
                    info.size = len(body)
                    info.mtime = 0  # determinism: no wall clock in bytes
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    info.mode = 0o644
                    state["tar"].addfile(info, io.BytesIO(body))
                state["n"] += 1
        close_current()
        yield pd.DataFrame(out, columns=["shard", "n_samples", "n_bytes", "digest"])

    return src.mapInPandas(write, schema=MANIFEST_SCHEMA)


def read_tar_shards(spark: SparkSession, shard_dir: str) -> DataFrame:
    """Read WebDataset-style shards back: one row per sample with a
    ``members`` map of extension -> bytes. Shard files are parallelized as
    paths (one task per shard) and parsed executor-side — the driver never
    holds sample bytes."""
    paths = sorted(
        os.path.join(shard_dir, n)
        for n in os.listdir(shard_dir)
        if n.endswith(".tar")
    )
    pdf = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        max(len(paths), 1)
    )

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for b in batches:
            rows = []
            for path in b["path"]:
                shard = os.path.basename(path)
                with tarfile.open(path, "r") as tar:
                    cur_key, members = None, {}
                    for info in tar:
                        base, _, ext = info.name.rpartition(".")
                        if cur_key is not None and base != cur_key:
                            rows.append((cur_key, shard, members))
                            members = {}
                        cur_key = base
                        members[ext] = tar.extractfile(info).read()
                    if cur_key is not None:
                        rows.append((cur_key, shard, members))
            yield pd.DataFrame(rows, columns=["key", "shard", "members"])

    return pdf.mapInPandas(parse, schema=SAMPLE_SCHEMA)
