"""Streaming ingest: docs files -> extracted claims table, exactly-once.

The batch pipeline (plans/pipeline.py) assumes the docs table is finished.
On a live corpus the extraction stage is the natural streaming boundary:
new doc files land continuously, extraction is stateless per doc, and the
iterative fusion models need complete buckets — so the streaming job owns
docs -> claims (append, exactly-once via the checkpoint's file log), and
fusion runs batch over the claims table per closed bucket, exactly as the
reference fuses per finished temporal bucket (generate_buckets.py windows).

This mirrors how the reference separates dataset construction from fusion
(fusion_pipeline.py runs over already-materialized buckets); the streaming
twin just makes the construction half incremental.

Exactly-once comes from Structured Streaming's own contract: the parquet
file source tracks processed files in the checkpoint, the file sink commits
via its transaction log, so a crash/restart (or an availableNow re-trigger
with no new files) appends nothing twice. Tested by replaying the same
checkpoint across staged file drops in tests/test_lineage_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from trustfuse_spark.datagen import _SPAN_ARRAY_T
from trustfuse_spark.plans.pipeline import docs_to_claims

def docs_schema() -> T.StructType:
    """One source of truth for the docs shape: the generator's span DDL. A
    hand-copied schema here would silently drift on evolution — Spark's
    file source with a user schema nulls mismatched fields instead of
    erroring. Built lazily: DDL parsing needs an active session, so a
    module-level constant would break plain imports."""
    return T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("spans", T._parse_datatype_string(_SPAN_ARRAY_T)),
        ]
    )


def stream_claims(
    spark: SparkSession,
    docs_dir: str,
    attr_types: DataFrame | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming docs -> claims: the extraction stage of plans/pipeline.py
    over a file stream. Same operator, same output schema — docs_to_claims
    is pure per-row expressions plus a broadcast stream-static dim join, so
    it is streaming-safe unchanged.

    max_files_per_trigger bounds micro-batch size for steady-state runs
    (unset for availableNow backfills, where Spark slices on its own)."""
    reader = spark.readStream.schema(docs_schema())
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_dir)
    return docs_to_claims(docs, attr_types=attr_types)


def run_claims_ingest(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    attr_types: DataFrame | None = None,
    available_now: bool = True,
):
    """Run (or resume) the docs->claims ingest against a checkpoint.

    Returns the StreamingQuery; availableNow=True drains everything new and
    stops — the batch-backfill / catch-up mode — while False leaves a
    continuous micro-batch job for live tailing. Restart-safety and
    no-duplicate appends come from the checkpoint + parquet sink log."""
    claims = stream_claims(spark, docs_dir, attr_types=attr_types)
    writer = (
        claims.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
