"""Structured Streaming capability (incremental crawl ingest).

The reference is batch-only (SURVEY §2.8) — its ``--load-mode stream`` is
constant-RAM iteration, not event-time streaming. This module is the additive
capability for incremental ingest: the SAME narrow extraction/normalization
transforms run unchanged on a streaming DataFrame, plus watermarked
event-time windowing and within-watermark dedup.
"""

from address_parser_spark.streaming.ingest import (
    dedup_mentions_stream,
    read_pages_stream,
    windowed_mention_counts,
)

__all__ = ["read_pages_stream", "windowed_mention_counts", "dedup_mentions_stream"]
