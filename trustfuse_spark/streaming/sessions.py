"""Structured Streaming twins of the batch temporal operators.

The reference is batch (buckets are temporal windows over a finished revision
history, SURVEY §2.9), so batch-over-table is the faithful mapping — these
streaming variants are the forward-looking surface for live claim streams:

  stream_session_buckets : session_window(ts, gap) + watermark — the
      streaming equivalent of operators/bucketize.sessionize
  stream_claim_counts    : windowed per-(entity, attr) claim aggregation
      with late-data watermark
  stream_majority        : incremental majority vote per fact (update mode)

All take any streaming DataFrame with (source, entity, attr, value_str, ts);
tests drive them with a rate/memory source through foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_session_buckets(
    claims: DataFrame, gap: str = "10 days", watermark: str = "1 day"
) -> DataFrame:
    """Session windows per entity: the bucket-closure rule as a native
    session_window (claims separated by > gap fall into new sessions)."""
    return (
        claims.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("entity"))
        .agg(
            F.count("*").alias("n_claims"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select("entity", "w.start", "w.end", "n_claims", "first_ts", "last_ts")
    )


def stream_claim_counts(
    claims: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    return (
        claims.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "entity", "attr")
        .agg(F.count("*").alias("n_claims"), F.countDistinct("source").alias("n_sources"))
        .select("entity", "attr", "w.start", "w.end", "n_claims", "n_sources")
    )


def stream_majority(
    claims: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Incremental vote counts per (window, fact, value); the mode per fact
    is the max-count row downstream (complete/update sink or foreachBatch
    argmax — streaming window functions can't rank, so the argmax runs in
    the sink batch)."""
    return (
        claims.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "entity", "attr", "value_str")
        .agg(F.count("*").alias("votes"))
        .select("entity", "attr", "value_str", "votes", "w.start", "w.end")
    )
