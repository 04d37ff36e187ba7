"""Streaming corpus curation: raw doc files -> redacted, scored, deduped
docs table, exactly-once.

The batch curation chain (plans/curate.py) assumes a finished corpus. On a
live crawl the row-local stages are the natural streaming prefix: PII
redaction, quality scoring, and the quality filter are stateless per doc,
and exact dedup has a bounded-state streaming twin —
``dropDuplicatesWithinWatermark`` on the text hash, which deduplicates any
two copies arriving within the watermark horizon while Spark ages the hash
state out (unbounded-state dedup is exactly what a 100-TB stream cannot
afford). Cross-horizon stragglers are left to the batch
`dedup.exact_duplicates` sweep that runs over closed partitions — the same
split as ingest: streaming owns the incremental prefix, batch owns the
global stages (near-dup LSH, stratified sampling, packing) per closed
bucket.

Exactly-once: the parquet file source tracks processed files in the
checkpoint, the file sink commits through its transaction log — restart or
an availableNow re-trigger with no new files appends nothing twice
(tested by staged file drops against one checkpoint in
tests/test_lineage_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trustfuse_spark.operators.curation import pii_redact
from trustfuse_spark.operators.textstats import quality_features


def raw_docs_schema() -> T.StructType:
    """Raw crawl shape: (doc_id, text, source, ts). Built lazily — see
    ingest.docs_schema for why not a module constant."""
    return T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )


def stream_curated_docs(
    spark: SparkSession,
    docs_dir: str,
    min_quality: float = 0.2,
    dedup_watermark: str = "1 hour",
    benchmark: DataFrame | None = None,
    bench_ngram: int = 8,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming curation prefix: redact -> score -> filter ->
    [decontaminate] -> dedup-within-watermark. Output columns: doc_id,
    source, ts, text (redacted), quality_score.

    ``benchmark`` (static DataFrame with a ``gram`` column) drops
    contaminated docs. The batch `decontaminate` re-aggregates per doc —
    not expressible in append mode — so the stream uses the row-local
    `curation.contamination_keep`: up to 10k grams a plan-literal
    ``arrays_overlap`` (zero Python, but O(|benchmark|) per row — ADVICE
    r4), beyond that a broadcast frozenset probed by an Arrow-batched
    pandas filter at O(|doc grams|) per doc, and above 20M grams a loud
    refusal (that is corpus-scale data, not an eval suite — run the batch
    sweep over closed partitions). Same keep/drop decision as batch on
    every tier, no per-doc match counts.

    Dedup keys on xxhash64(redacted text) — 8 bytes of state per distinct
    doc within the horizon instead of the text itself (the batch hash-first
    trick applied to stream state); a 64-bit collision can drop a unique doc
    (~1e-9 at 100M in-horizon docs), acceptable for corpus curation, and the
    batch sweep behind the horizon is collision-safe."""
    reader = spark.readStream.schema(raw_docs_schema())
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_dir)
    red = docs.withColumn("text", pii_redact(F.col("text")))
    scored = quality_features(red, "text").filter(
        F.col("quality_score") >= min_quality
    )
    if benchmark is not None:
        from trustfuse_spark.operators.curation import contamination_keep

        # drop NULL grams: a single null element in the literal makes
        # arrays_overlap return NULL (not false) for every clean doc, and
        # filter(~NULL) would silently discard the whole stream
        grams = [
            r["gram"]
            for r in benchmark.select("gram").distinct().collect()
            if r["gram"] is not None
        ]
        if grams:
            scored = scored.filter(
                contamination_keep(spark, F.col("text"), grams, bench_ngram)
            )
    keyed = scored.select(
        "doc_id", "source", "ts", "text", "quality_score",
        F.xxhash64("text").alias("text_h"),
    ).withWatermark("ts", dedup_watermark)
    return keyed.dropDuplicatesWithinWatermark(["text_h"]).drop("text_h")


def run_curated_ingest(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.2,
    dedup_watermark: str = "1 hour",
    benchmark: DataFrame | None = None,
    bench_ngram: int = 8,
    available_now: bool = True,
):
    """Run (or resume) the streaming curation prefix against a checkpoint.
    Returns the StreamingQuery (availableNow drains-and-stops)."""
    curated = stream_curated_docs(
        spark, docs_dir, min_quality=min_quality,
        dedup_watermark=dedup_watermark, benchmark=benchmark,
        bench_ngram=bench_ngram,
    )
    writer = (
        curated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
