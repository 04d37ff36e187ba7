"""Grouped statistical model fitting as sufficient-statistic aggregations.

A curation pipeline constantly asks "how does metric y move with metric x
within each slice" — tokens vs quality per domain, price vs quantity per
segment, score drift per source. The closed-form OLS fit needs only the
five sufficient sums (n, Sx, Sy, Sxx, Sxy [, Syy]) — ONE map-side-combined
hash aggregate per group, no second pass, no per-row Python, mergeable
across shards by adding the sums. That is the 100-TB shape: the regression
over a trillion rows costs exactly one groupBy.

Exactness contract: inputs are cast to DECIMAL(20,6) and products to
DECIMAL(38,12) BEFORE summing, so every sum is exact and order-independent
(double summation drifts with partition order and would break value gates);
the final slope/intercept/r2 arithmetic happens once per group in double on
those exact sums — bit-identical on any engine that follows the same cast
chain (the driver oracle replays it in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple linear regression y = slope*x + intercept.

    Returns (group_col, n, slope, intercept, r2) — groups whose x has zero
    variance get NULL slope/intercept/r2 (vertical fit), matching SQL
    regr_slope semantics. r2 is the squared Pearson correlation; zero y
    variance likewise yields NULL.
    """
    xd = F.col(x_col).cast("decimal(20,6)")
    yd = F.col(y_col).cast("decimal(20,6)")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("decimal(38,12)").alias("sx"),
        F.sum(yd).cast("decimal(38,12)").alias("sy"),
        F.sum((xd * yd).cast("decimal(38,12)")).alias("sxy"),
        F.sum((xd * xd).cast("decimal(38,12)")).alias("sxx"),
        F.sum((yd * yd).cast("decimal(38,12)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = F.when(var_x != 0, cov_n / var_x)
    intercept = F.when(var_x != 0, (sy - (cov_n / var_x) * sx) / n)
    r2 = F.when((var_x != 0) & (var_y != 0), (cov_n * cov_n) / (var_x * var_y))
    return agg.select(
        group_col,
        F.col("n").cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def group_quantiles(
    df: DataFrame,
    group_col: str,
    col: str,
    probs: list[float] = (0.1, 0.5, 0.9),
) -> DataFrame:
    """Exact linear-interpolated quantiles per group (type-7 / SQL
    PERCENTILE_CONT semantics — position p*(n-1), the same rule DuckDB's
    quantile_cont and numpy's default follow), one output row per
    (group, prob).

    Uses Spark's JVM-side exact `percentile` aggregate: correct to the
    element, but its buffer holds each group's values — the per-group
    memory is O(group size), fine for dashboard-grade slices (this engine's
    use), wrong for billion-row groups; switch to `approx_percentile` with
    a tuned accuracy there (same call shape, documented error bound).
    `median_exact` (A2) remains the two-rank window formulation; this is
    the multi-quantile surface.
    """
    parr = F.array(*[F.lit(float(p)) for p in probs])
    agg = df.groupBy(group_col).agg(
        F.percentile(F.col(col).cast("double"), parr).alias("qs")
    )
    return agg.select(
        group_col,
        F.posexplode("qs").alias("pidx", "q"),
    ).select(
        group_col,
        F.element_at(parr, F.col("pidx") + 1).alias("prob"),
        F.col("q").alias("quantile"),
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    col: str,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Per-group winsorization: clip ``col`` to its group's [lo, hi]
    exact type-7 quantiles — the outlier-taming step ahead of
    moment-based fusion (CRH/CATD variance terms are quadratic in
    outliers; one corrupt magnitude otherwise owns a source's weight).

    Two passes by necessity (the bounds ARE group statistics): one
    `group_quantiles`-style percentile agg (tiny output, one row per
    group) broadcast back onto the rows, then a map-side clip. Adds
    ``<col>_wins`` and ``clipped`` (1 when the value moved).
    """
    bounds = df.groupBy(group_col).agg(
        F.percentile(F.col(col).cast("double"), F.lit(float(lo))).alias("__lo"),
        F.percentile(F.col(col).cast("double"), F.lit(float(hi))).alias("__hi"),
    )
    out = df.join(F.broadcast(bounds), group_col)
    w = F.least(F.greatest(F.col(col).cast("double"), F.col("__lo")), F.col("__hi"))
    return (
        out.withColumn(f"{col}_wins", w)
        .withColumn("clipped", (w != F.col(col).cast("double")).cast("int"))
        .drop("__lo", "__hi")
    )
