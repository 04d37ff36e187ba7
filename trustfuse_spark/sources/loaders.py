"""Reference-format dataset loaders (SURVEY §2.1 S1-S4).

Reads the exact on-disk shapes the reference consumes and converts them to
the engine's long-form claims:

  load_tsv_bucket   : headerless TSV, latin-1, per-dataset positional
                      headers (StaticDataset, dataset.py:269-334; headers
                      settings.py:27-66)
  wide_to_long      : wide claim rows (Source, <entity>, attr columns...) ->
                      (source, entity, attr, value_str) via stack/melt
  load_bucket_dir   : one TSV per bucket (flight's yyyymmdd.txt) with
                      bucket_id from the file name
  cumulative_union  : dynamic-dataset bucket i = union of buckets <= i
                      (dataset.py:362-379) — resolved as a filter on the
                      long table, never physical copies
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BOOK_HEADER = ["Source", "ISBN", "Title", "Author list"]
FLIGHT_HEADER = [
    "Source", "Flights#", "Scheduled departure", "Actual departure",
    "Departure gate", "Scheduled arrival", "Actual arrival", "Arrival gate",
]


def load_tsv_bucket(
    spark: SparkSession,
    path: str,
    header: list[str],
    encoding: str = "ISO-8859-1",
) -> DataFrame:
    """Headerless TSV -> wide DataFrame with the positional header applied;
    trailing empty column (from a trailing tab) dropped, mirroring the
    reference's read."""
    df = spark.read.csv(path, sep="\t", header=False, encoding=encoding)
    cols = df.columns
    if len(cols) > len(header):
        df = df.drop(*cols[len(header):])
        cols = df.columns
    return df.toDF(*header[: len(cols)])


def wide_to_long(
    wide: DataFrame,
    entity_col: str,
    source_col: str = "Source",
    bucket_id: int = 0,
) -> DataFrame:
    """Wide claim table -> long claims (null cells dropped, the reference's
    claim-matrix NaN filter, model.py:145)."""
    attrs = [c for c in wide.columns if c not in (entity_col, source_col)]
    stack_expr = "stack({n}, {args}) as (attr, value_str)".format(
        n=len(attrs),
        args=", ".join(f"'{a}', `{a}`" for a in attrs),
    )
    return (
        wide.select(
            F.lit(bucket_id).alias("bucket_id"),
            F.col(source_col).alias("source"),
            F.col(entity_col).alias("entity"),
            F.expr(stack_expr),
        )
        .filter(F.col("value_str").isNotNull() & (F.trim("value_str") != ""))
    )


def load_bucket_dir(
    spark: SparkSession,
    directory: str,
    header: list[str],
    entity_col: str,
    encoding: str = "ISO-8859-1",
) -> DataFrame:
    """Directory of per-bucket TSVs (e.g. flight yyyymmdd.txt): bucket_id =
    chronological rank of the file name."""
    files = sorted(
        f for f in os.listdir(directory) if re.match(r"^\d+\.txt$", f)
    )
    parts = []
    for i, name in enumerate(files):
        wide = load_tsv_bucket(spark, os.path.join(directory, name), header, encoding)
        parts.append(wide_to_long(wide, entity_col, bucket_id=i))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cumulative_union(claims: DataFrame, upto: int | None = None) -> DataFrame:
    """Dynamic-dataset view: rows of all buckets <= upto (or a running
    view when upto is None via a bucket_upto column crossjoin-free trick is
    unnecessary — callers filter per bucket of interest)."""
    if upto is None:
        return claims
    return claims.filter(F.col("bucket_id") <= upto)
