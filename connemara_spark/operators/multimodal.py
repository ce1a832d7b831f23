"""Multimodal columns: binary payloads + typed metadata, Arrow-batched
processing plumbing.

Media are opaque ``binary`` columns with a typed metadata struct — the
pattern a 100 TB multimodal pipeline needs: the *plumbing* (schema,
partition sizing, Arrow batch shape, UDF signatures) is real and tested;
the codec itself is STUBBED because image/audio libraries are not available
in this environment:

- ``decode_images(df, fake=False)`` raises NotImplementedError at the codec
  boundary unless ``fake=True``, which runs a deterministic header parser
  (our own 16-byte fake format) exercising the identical mapInPandas path.
- ``sample_frames`` — video frame sampling: emits one row per sampled frame
  index (the explode-shaped output real frame extraction has).

Scale notes: media bytes dominate row size, so operators repartition by
byte budget (``target_partition_bytes``) before the Python stage, keeping
each Arrow batch bounded; metadata-only transformations project the binary
column away FIRST (column pruning keeps the scan light).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

# fake codec: 16-byte header = magic 'CNMR' + u16 width + u16 height +
# u32 duration_ms + u32 payload checksum seed
_FAKE_MAGIC = b"CNMR"


def encode_fake_media(media_id: int, kind: str, width: int, height: int, duration_ms: int, body: bytes) -> bytes:
    return _FAKE_MAGIC + struct.pack("<HHII", width, height, duration_ms, len(body)) + body


def estimate_partitions(df: DataFrame, payload_col: str = "payload", target_partition_bytes: int = 128 << 20) -> int:
    """Partition count from total payload bytes / target bytes-per-partition
    — media-aware sizing so Arrow batches stay bounded."""
    total = df.select(F.sum(F.length(payload_col))).first()[0] or 0
    return max(1, int(total // target_partition_bytes) + 1)


IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes int, mean_byte double, checksum long"
)


def decode_images(df: DataFrame, *, fake: bool = False, target_partition_bytes: int = 128 << 20) -> DataFrame:
    """Decode + feature-extract images via Arrow-batched mapInPandas.

    Real decoding requires an image library not present in this container —
    the codec boundary raises NotImplementedError unless ``fake=True``
    (deterministic 16-byte header parser over the same plumbing).
    """
    if not fake:
        raise NotImplementedError(
            "image codec not available in this environment; pass fake=True "
            "for the deterministic stub (plumbing is identical)"
        )
    n_parts = estimate_partitions(df, target_partition_bytes=target_partition_bytes)
    src = df.select("media_id", "payload").repartition(n_parts)

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if not raw.startswith(_FAKE_MAGIC):
                    continue  # undecodable → dropped (real pipeline: quarantine)
                w, h, dur, blen = struct.unpack("<HHII", raw[4:16])
                body = raw[16 : 16 + blen]
                mean = sum(body) / len(body) if body else 0.0
                checksum = sum(body) % (1 << 31)
                out.append((int(mid), w, h, len(raw), float(mean), int(checksum)))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "n_bytes", "mean_byte", "checksum"]
            )

    return src.mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, *, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize stub: real implementation would decode→resize→re-encode in the
    same mapInPandas shape; fake mode rewrites the header dims only."""
    if not fake:
        raise NotImplementedError("image codec not available; pass fake=True")

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if not raw.startswith(_FAKE_MAGIC):
                    continue
                _, _, dur, blen = struct.unpack("<HHII", raw[4:16])
                rows.append((int(mid), _FAKE_MAGIC + struct.pack("<HHII", width, height, dur, blen) + raw[16:]))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return df.select("media_id", "payload").mapInPandas(resize, schema="media_id long, payload binary")


def sample_frames(df: DataFrame, *, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame timestamp —
    native explode on the frame grid (cheap), codec stubbed at the decode."""
    if not fake:
        raise NotImplementedError("video codec not available; pass fake=True")
    dur = F.col("meta.duration_ms")
    grid = F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(every_ms))
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(grid).alias("frame_ms"))
    )
