"""Structured Streaming layer (SURVEY §2.8)."""

from connemara_spark.streaming.driver import StreamingReplayer
from connemara_spark.streaming.ingest import (
    StreamingAnnIngest,
    StreamingCorpusIngest,
    StreamingNearDupIngest,
)

__all__ = [
    "StreamingAnnIngest",
    "StreamingCorpusIngest",
    "StreamingNearDupIngest",
    "StreamingReplayer",
]
