"""Table-maintenance compaction: rewrite a directory of skewed small files
into evenly-sized, optionally clustered files.

Ingest and streaming sinks leave thousands of small files per partition
(every micro-batch/task writes one); scans then pay per-file open cost and
lose footer-stat pruning. The standard maintenance pass — Iceberg's
rewrite_data_files / OPTIMIZE — is, in DataFrame terms, exactly: size the
input, pick ceil(bytes / target_file_size) output files, ONE
repartition(Range) exchange, sorted-within-partition write. This module
does that against any parquet directory (the Iceberg seam reuses it when
the runtime jar is present — plans/lineage.py IcebergSink).

Sizing reads the FILE FOOTERS only (Spark's in-memory file index), never
the data; the single exchange is the same shuffle a sorted write pays
anyway.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Inspect a parquet directory and return the compaction plan:
    {n_files, total_bytes, target_files} — target = ceil(total/target_size),
    floor 1. Driver-side file-listing only (bounded metadata)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    total = 0
    n = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet"):
            total += f.getLen()
            n += 1
    return {
        "n_files": n,
        "total_bytes": total,
        "target_files": max(1, math.ceil(total / target_file_bytes)),
    }


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite ``in_path`` into ``out_path`` with ceil(bytes/target) files,
    optionally range-clustered + sorted on ``sort_cols`` (tight footer
    min/max per file -> predicate pruning survives the rewrite). Returns
    the executed plan dict (input stats + target_files).

    One exchange total: repartition(n) when unclustered,
    repartitionByRange(n, cols)+sortWithinPartitions when clustered.
    """
    plan = plan_compaction(spark, in_path, target_file_bytes)
    df: DataFrame = spark.read.parquet(in_path)
    n = plan["target_files"]
    if sort_cols:
        out = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(out_path)
    return plan
