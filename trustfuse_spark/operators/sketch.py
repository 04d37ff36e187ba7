"""Streaming-mergeable frequency sketches.

At 10^12 documents exact per-token counts are a vocabulary-sized table —
cheap; what a PIPELINE needs sketches for is the mergeable fixed-size
summary: a Count-Min sketch (Cormode & Muthukrishnan 2005) built per
partition and merged by cell-wise addition gives frequency estimates with
an eps-delta guarantee in O(depth * width) space, supports cross-corpus
union without re-scanning, and feeds heavy-hitter gating in streams where
the exact vocab agg would be unbounded state.

Scale shape: the corpus collapses ONCE into the distinct-token count table
(one map-side-combined hash agg — the `train_bpe` convention); each token
row then fans out ``depth`` cells (map-side) into a second (row, col) hash
agg whose output is the depth x width sketch — bounded freight, broadcast
anywhere. Estimation joins the query tokens (a small dim) against the
BROADCAST sketch and takes the min over rows — never touches the corpus.

Hashes: xxhash64(token, row) for corpus runs (JVM codegen); the
``portable_hash`` variant folds the token once with the 31-bit polynomial
fold and derives row r's bucket as ((h + r + 1) * 2654435761 % (2^31-1))
% width — the Knuth multiplicative mix scrambles the low bits, so
power-of-two widths still spread (a plain h*(31+r)+r mix collapses mod 2^k
when 31+r is a multiple of 2^k); plain arithmetic any SQL oracle replays
exactly (the dsir/stratified gate convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trustfuse_spark.operators.curation import _POLY_M31, _poly31


def _bucket(token: Column, row: Column, width: int, portable: bool) -> Column:
    if portable:
        h = _poly31(token)
        return (((h + row + 1) * F.lit(2654435761)) % F.lit(_POLY_M31)) % width
    return F.pmod(F.xxhash64(token, row), F.lit(width))


def count_min_sketch(
    docs: DataFrame,
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
    portable_hash: bool = False,
) -> DataFrame:
    """Build the depth x width Count-Min sketch of the corpus's whitespace
    token frequencies. Returns (row, col, cnt) — only non-empty cells are
    emitted (absent cells are zero). For any token t,

        f(t) <= min over rows r of cell[r, bucket_r(t)]

    with the standard (eps = e/width, delta = exp(-depth)) overcount bound.
    Cell-wise addition of two sketches is the sketch of the concatenated
    corpora — the mergeability that makes this a cross-shard summary.
    """
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("token")
    )
    tc = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    cells = tc.select(
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
        ).alias("cell"),
        "c",
    )
    return (
        cells.groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
        .agg(F.sum("c").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    width: int,
    depth: int,
    token_col: str = "token",
    portable_hash: bool = False,
) -> DataFrame:
    """Estimate each query token's corpus frequency from a `count_min_sketch`
    built with the SAME (width, depth, hash) parameters: the min over rows
    of the addressed cells (absent cell = 0). ``queries`` is a small dim;
    the sketch (<= depth*width rows) broadcasts, so estimation is one
    map-side join + one query-keyed hash agg.
    """
    # two steps: aliasing <token_col> AS token in the SAME select whose
    # transform lambda reads F.col("token") trips Spark's lateral-column-
    # alias resolution (INTERNAL_ERROR on resolved plans)
    q = queries.select(F.col(token_col).alias("token"))
    probes = q.select(
        "token",
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
        ).alias("cell"),
    ).select("token", "cell.row", "cell.col")
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left")
    return joined.groupBy("token").agg(
        F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("estimate")
    )
