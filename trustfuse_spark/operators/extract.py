"""Triple/claim extraction over interleaved text+media spans.

Input (BASELINE input_hint): docs(doc_id, spans:array<struct<kind,text,
media_ref,offset>>). Text spans carry claim sentences "<entity> | <attr> |
<value>"; media spans are routed out of fusion but carried through as
provenance — mirroring the reference's media-property filter
(reference: generate_buckets.py:81-133) and its typed value extraction
(reference: generate_conflicting_dataset.py:233-287).

Two implementations with identical output schema:

* :func:`extract_claims` — pure DataFrame expressions (posexplode + split +
  regexp). Catalyst-visible, whole-stage-codegen'd, the fast path.
* :func:`extract_claims_arrow` — ``mapInPandas`` Arrow-batched UDF, the
  general path for messy real-world text where parsing needs Python. Same
  output, used to validate the UDF plumbing the north_star requires.

Both attach ``source`` parsed from doc_id (docs are one revision of one
source about one entity) and preserve span order via ``span_idx``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CLAIM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("span_idx", T.IntegerType()),
        T.StructField("entity", T.StringType()),
        T.StructField("attr", T.StringType()),
        T.StructField("value_str", T.StringType()),
        T.StructField("media_refs", T.ArrayType(T.StringType())),
    ]
)


def _source_from_doc_id() -> "F.Column":
    # doc_id = d{entity:06d}_{source:04d}_{rev:02d}; split beats a
    # capture-group regex by ~3x on the hot path
    return F.concat(F.lit("src_"), F.split("doc_id", "_").getItem(1))


def exploded_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, span_idx, kind, text, media_ref, offset) preserving order."""
    return docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def extract_claims(docs: DataFrame) -> DataFrame:
    """Native-expression extraction: text spans -> (doc_id, source, entity,
    attr, value_str, media_refs).

    media_refs = the doc's media-span refs in span order, carried through as
    provenance on every claim from that doc. Computed per row with
    filter/transform BEFORE the explode — zero shuffles in this stage (the
    groupBy-join formulation cost a full extra shuffle+join over the corpus).
    """
    with_media = docs.select(
        "doc_id",
        "spans",
        F.transform(
            F.filter("spans", lambda s: s["kind"] == "media"),
            lambda s: s["media_ref"],
        ).alias("media_refs"),
    )
    spans = with_media.select(
        "doc_id", "media_refs", F.posexplode("spans").alias("span_idx", "span")
    ).filter(F.col("span.kind") == "text")
    parts = F.split(F.col("span.text"), r" \| ", 3)
    return (
        spans.select(
            "doc_id",
            "span_idx",
            "media_refs",
            F.trim(parts.getItem(0)).alias("entity"),
            F.trim(parts.getItem(1)).alias("attr"),
            F.trim(parts.getItem(2)).alias("value_str"),
        )
        .filter(
            F.col("entity").isNotNull()
            & F.col("attr").isNotNull()
            & F.col("value_str").isNotNull()
        )
        .withColumn("source", _source_from_doc_id())
    )


def extract_claims_arrow(docs: DataFrame) -> DataFrame:
    """Arrow-batched extraction via ``mapInPandas`` (no per-row Python UDF
    calls; whole Arrow batches cross the JVM/Python boundary once).
    """
    out_schema = T.StructType(
        CLAIM_SCHEMA.fields + [T.StructField("source", T.StringType())]
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", "span_idx", "entity", "attr",
                                      "value_str", "media_refs", "source")}
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                media_refs = [s["media_ref"] for s in spans if s["kind"] == "media"]
                src = "src_" + doc_id.split("_")[1] if "_" in doc_id else ""
                for i, s in enumerate(spans):
                    if s["kind"] != "text":
                        continue
                    pieces = [p.strip() for p in s["text"].split(" | ", 2)]
                    if len(pieces) != 3:
                        continue
                    rows["doc_id"].append(doc_id)
                    rows["span_idx"].append(i)
                    rows["entity"].append(pieces[0])
                    rows["attr"].append(pieces[1])
                    rows["value_str"].append(pieces[2])
                    rows["media_refs"].append(media_refs)
                    rows["source"].append(src)
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "spans").mapInPandas(parse, schema=out_schema)


def spans_roundtrip(docs: DataFrame) -> DataFrame:
    """Per-row invariant surface: the span sequence carried through the
    extraction stage. The pipeline must preserve (kind, text, media_ref,
    order) per doc exactly (input_hint requirement); tests compare this
    against the raw input.
    """
    return (
        exploded_spans(docs)
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("span_idx", "kind", "text", "media_ref"))
            ).alias("spans_seq")
        )
    )
