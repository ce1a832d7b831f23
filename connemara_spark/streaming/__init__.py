"""Structured Streaming layer (SURVEY §2.8)."""

from connemara_spark.streaming.driver import StreamingReplayer

__all__ = ["StreamingReplayer"]
