"""Streaming sketch maintenance: HyperLogLog registers and Count-Min cells
as standing streaming aggregations.

The batch sketches (operators/sketch.py) are mergeable by construction —
register max / cell add — which is exactly the shape Structured Streaming's
stateful aggregation maintains incrementally: state per group is one max or
one sum, bounded at m registers / depth*width cells TOTAL regardless of how
many documents stream through (contrast the sessionizer, whose state is
per-key). A cross-shard distinct-count or frequency summary therefore
needs no batch re-scan: the stream keeps the registers current, and
`hll_estimate` / `cms_estimate` read them at any time.

Both twins reuse the batch operators' own per-row expressions, so
stream == batch row-for-row on the same input (pinned by pytest, the
sessions-twin contract): complete-mode output of the streaming agg equals
the batch `hyperloglog` / `count_min_sketch` of the union of all
micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_hll_registers(
    docs: DataFrame,
    m: int = 64,
    text_col: str = "text",
    portable_hash: bool = False,
) -> DataFrame:
    """Standing HLL register table over a streaming docs source: the same
    per-occurrence (idx, rho) expressions as the batch `hyperloglog`,
    aggregated with a streaming max — state is <= m rows, forever. Write
    with outputMode('complete') (the register table IS the result) or
    'update' for changed registers only.
    """
    from trustfuse_spark.operators.sketch import hyperloglog

    # the batch builder is pure dataflow (map + groupBy max), so it is
    # directly valid on a streaming DataFrame — reuse it verbatim
    return hyperloglog(docs, m=m, text_col=text_col, portable_hash=portable_hash)


def stream_cms_cells(
    docs: DataFrame,
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
    portable_hash: bool = False,
) -> DataFrame:
    """Standing Count-Min cell table over a streaming docs source — the
    batch `count_min_sketch` minus its distinct-token pre-collapse (a
    second stacked streaming agg; the cell sums are identical because
    addition is associative): tokens fan out depth cells map-side and a
    single streaming sum agg maintains <= depth*width cells of state.
    """
    from trustfuse_spark.operators.sketch import _bucket

    toks = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("token")
    )
    cells = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda r: F.struct(
                    r.cast("long").alias("row"),
                    _bucket(F.col("token"), r.cast("long"), width, portable_hash)
                    .cast("long")
                    .alias("col"),
                ),
            )
        ).alias("cell")
    )
    return (
        cells.groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
