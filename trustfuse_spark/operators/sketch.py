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

def hyperloglog(
    docs: DataFrame,
    m: int = 64,
    text_col: str = "text",
    portable_hash: bool = False,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007) for the corpus's
    distinct-token cardinality: each token occurrence hashes once, the low
    log2(m) bits pick a register, and the register keeps the MAX of
    rho = 1 + trailing-zero-count of the remaining bits. Returns the
    non-zero registers as (idx, rho) — absent registers are zero.

    Scale shape: the rho computation is per-occurrence map-side expression
    work and the register table is a groupBy(idx).max — a MAP-SIDE-COMBINED
    hash agg whose exchange is <= m rows per partition regardless of corpus
    size. No distinct, no vocab table: the sketch reads the corpus once.
    Element-wise MAX of two register tables (union + the same agg) is the
    sketch of the union of the corpora — the mergeability that makes HLL
    the cross-shard cardinality summary (Spark's own approx_count_distinct
    wraps the same structure; this exposes the registers so shards/streams
    can be merged and audited explicitly).

    ``portable_hash`` folds the token through the 31-bit polynomial + one
    Knuth mix round (plain arithmetic, SQL-replayable — the lm_suite gate
    convention); production runs use xxhash64 folded to 62 bits.
    """
    if m & (m - 1) or m < 2:
        raise ValueError("m must be a power of two >= 2")
    b = m.bit_length() - 1
    toks = docs.select(
        *(group_cols or []),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("token"),
    )
    if portable_hash:
        h = _poly31(F.col("token"))
        hm = ((h + 1) * F.lit(2654435761)) % F.lit(_POLY_M31)
        width = 31
    else:
        hm = F.pmod(F.xxhash64(F.col("token")), F.lit(1 << 62))
        width = 62
    cap = width - b + 1
    reg = toks.select(
        *(group_cols or []),
        hm.bitwiseAND(F.lit(m - 1)).cast("long").alias("idx"),
        F.shiftright(hm, b).alias("rest"),
    )
    # rho = trailing zeros of rest + 1; rest & -rest isolates the lowest set
    # bit, whose log2 is exact in double (power of two)
    rho = (
        F.when(F.col("rest") == 0, F.lit(cap))
        .otherwise(F.log2(F.col("rest").bitwiseAND(-F.col("rest"))) + 1)
        .cast("long")
    )
    keys = list(group_cols or []) + ["idx"]
    return reg.select(*(group_cols or []), "idx", rho.alias("rho")).groupBy(
        *keys
    ).agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame, m: int, group_cols: list[str] | None = None
) -> DataFrame:
    """Cardinality estimate from a `hyperloglog` register table built with
    the SAME m: the standard bias-corrected harmonic mean
    E = alpha_m * m^2 / (sum_j 2^-M_j), with the small-range linear-counting
    correction E <= 2.5m & V>0 -> m*ln(m/V) (V = zero registers).

    Deterministic to the bit: every 2^-rho term and every partial sum is an
    exact dyadic double (magnitudes span < 53 bits), so the harmonic sum is
    order-independent and the estimate replays exactly in any SQL engine.
    Returns one row (n_zero, estimate). The register table is <= m rows —
    this agg is a scalar summary, not a corpus pass.
    """
    alpha = 0.7213 / (1.0 + 1.079 / m)
    gb = registers.groupBy(*group_cols) if group_cols else registers.groupBy()
    agg = gb.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    v = F.lit(m) - F.col("n_present")
    s = F.coalesce(F.col("s_present"), F.lit(0.0)) + v.cast("double")
    e_raw = F.lit(alpha * m * m) / s
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *(group_cols or []), v.cast("long").alias("n_zero"), est.alias("estimate")
    )


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    n_bits: int = 4096,
    k: int = 3,
    portable_hash: bool = False,
) -> DataFrame:
    """Bloom filter of the distinct ``key_col`` values as a word table
    (word, bits): bit position p_i(key) for i in 0..k-1, packed 64 bits per
    word, OR-merged by a map-side-combined bit_or hash agg — <= n_bits/64
    rows of bounded freight, broadcastable anywhere, and the union of two
    filters is the same agg over their concatenated word tables
    (mergeability, as for the Count-Min cells above).

    The portable variant derives p_i = ((poly31(key) + i + 1) * 2654435761
    % (2^31-1)) % n_bits — the `_bucket` Knuth-mix convention, replayable
    in SQL; production uses xxhash64(key, i).
    """
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    ks = keys.select(F.col(key_col).alias("key")).distinct()
    pos = ks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: _bucket(F.col("key"), i.cast("long"), n_bits, portable_hash)
                .cast("long"),
            )
        ).alias("pos")
    )
    return (
        pos.select(
            F.shiftright(F.col("pos"), 6).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prune(
    df: DataFrame,
    words: DataFrame,
    key_col: str,
    n_bits: int,
    k: int,
    portable_hash: bool = False,
    pass_col: str = "bloom_pass",
) -> DataFrame:
    """Mark each row of ``df`` with whether ``key_col`` MIGHT be in the set
    summarized by a `bloom_build` word table built with the SAME
    (n_bits, k, hash): ``pass_col`` true iff all k addressed bits are set.
    No false negatives; false-positive rate ~ (1 - e^{-kn/n_bits})^k.

    Plan shape: k chained BROADCAST left joins against the word table
    (<= n_bits/64 rows), one per hash function, each adding a bit-test
    column — ``df`` itself NEVER shuffles (no explode, no row-id agg; with
    the tiny build side each join is a map-side hash lookup and AQE keeps
    them in one stage). This is the join-pruning pattern: a multi-GB key
    set compressed to n_bits/8 bytes pre-filters the probe side so only
    might-match rows reach the (shuffle) verify join.
    """
    out = df
    oks = []
    for i in range(k):
        p, w, ok = f"__p{i}", f"__w{i}", f"__ok{i}"
        pos = _bucket(F.col(key_col), F.lit(i).cast("long"), n_bits, portable_hash)
        out = out.withColumn(p, pos.cast("long")).withColumn(
            w, F.shiftright(F.col(p), 6)
        )
        wt = words.select(F.col("word").alias(w), F.col("bits").alias(f"__bits{i}"))
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({p}, 64) AS INT))")
        out = (
            out.join(F.broadcast(wt), w, "left")
            .withColumn(
                ok,
                F.coalesce(F.col(f"__bits{i}"), F.lit(0)).bitwiseAND(mask) != 0,
            )
            .drop(w, p, f"__bits{i}")
        )
        oks.append(ok)
    cond = F.col(oks[0])
    for o in oks[1:]:
        cond = cond & F.col(o)
    return out.withColumn(pass_col, cond).drop(*oks)
