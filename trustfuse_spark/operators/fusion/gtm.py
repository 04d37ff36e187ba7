"""GTM (Gaussian truth model) as iterated DataFrame aggregations.

Reference semantics (gtm.py, verified — including its quirks, which we
replicate deliberately per SURVEY §7.4):

  numeric-only. Per fact:
    prior   = exact median of claims
    outlier strip = SINGLE pass removing claims with
                    |v - prior| / prior > delta0 (only when prior != 0)
                    (the reference's `while np.all(outliers) is False` loop
                    body never executes: np.bool_ is never Python False)
    sigma_e = population std of the surviving claims
    cn      = v - prior   (normalized claims; NOT divided by sigma_e)

  init:    truth0 = prior (non-normalized!), sigma^2 per source from the
           maximization step evaluated against truth0 — replicating the
           reference's mixed-scale initialization.
  EM loop (<= max_itr, global ||Δtruth||/||truth|| <= tol stop):
    E: truth_i = (mu0/sigma0^2 + Σ cn/σ_s^2) / (1/sigma0^2 + Σ 1/σ_s^2)
    M: σ_s^2 = Σ_facts (2β + (cn - truth)^2) / (2(α+1) + count_s)
  rescale: truth*sigma_e + prior, then snap to the nearest of the ORIGINAL
  claims (outliers included — reference snaps against initial_claim).
  weights = σ_s^2 (the reference reports source variance as "weights").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trustfuse_spark.operators.fusion.base import (
    FACT_KEYS,
    WEIGHT_KEYS,
    FusionResult,
    assemble_truth,
    CheckpointRotator,
    checkpoint,
    snap_to_claimed,
)


def fuse_gtm(
    claims: DataFrame,
    max_itr: int = 20,
    tol: float | None = 1e-3,
    alpha: float = 10.0,
    beta: float = 10.0,
    mu0: float = 0.0,
    sigma0: float = 1.0,
    delta0: float = 1.0,
    numeric_only: bool = True,
) -> FusionResult:
    if numeric_only:
        claims = claims.filter(F.col("claim_type") == "quantity")
    original = checkpoint(
        claims.filter(F.col("value_num").isNotNull()).select(
            *FACT_KEYS, "source", "value_num"
        )
    )
    prior = original.groupBy(*FACT_KEYS).agg(
        F.expr("percentile(value_num, 0.5)").alias("prior")
    )
    kept = original.join(prior, FACT_KEYS).filter(
        (F.col("prior") == 0)
        | (F.abs(F.col("value_num") - F.col("prior")) / F.abs(F.col("prior")) <= delta0)
    )
    # NB: reference divides by prior without abs(); priors are medians of
    # claimed values which are positive in all its datasets. abs() here keeps
    # the same behavior for positive priors and a sane one for negative.
    fact_stats = kept.groupBy(*FACT_KEYS).agg(
        F.stddev_pop("value_num").alias("sigma_e"),
        F.count("*").alias("n_kept"),
    )
    cn = checkpoint(
        kept.select(*FACT_KEYS, "source", (F.col("value_num") - F.col("prior")).alias("cn"))
    )
    counts = (
        cn.select(*WEIGHT_KEYS, *FACT_KEYS)
        .distinct()
        .groupBy(*WEIGHT_KEYS)
        .agg(F.count("*").alias("cnt"))
    )

    def maximization(truth_df: DataFrame) -> DataFrame:
        return (
            cn.join(truth_df, FACT_KEYS)
            .groupBy(*WEIGHT_KEYS)
            .agg(F.sum(2 * beta + (F.col("cn") - F.col("truth")) ** 2).alias("ssum"))
            .join(counts, WEIGHT_KEYS)
            .select(
                *WEIGHT_KEYS,
                (F.col("ssum") / (2 * (alpha + 1) + F.col("cnt"))).alias("sigma2"),
            )
        )

    # init: truth0 = prior (non-normalized), evaluated against normalized cn
    truth = prior.select(*FACT_KEYS, F.col("prior").alias("truth"))
    rot_s = CheckpointRotator(claims.sparkSession)
    rot_t = CheckpointRotator(claims.sparkSession)
    sigma2 = rot_s.rotate(maximization(truth))

    prev_truth: DataFrame | None = None
    for _ in range(max_itr):
        bw = F.broadcast(sigma2)
        truth = (
            cn.join(bw, WEIGHT_KEYS)
            .groupBy(*FACT_KEYS)
            .agg(
                (
                    (F.lit(mu0 / sigma0**2) + F.sum(F.col("cn") / F.col("sigma2")))
                    / (F.lit(1.0 / sigma0**2) + F.sum(1.0 / F.col("sigma2")))
                ).alias("truth")
            )
        )
        if tol is not None:
            truth = rot_t.rotate(truth)
        sigma2 = rot_s.rotate(maximization(truth))
        if tol is not None and prev_truth is not None:
            # ||Δtruth|| / ||truth_old|| as one scalar aggregation (never
            # collect the per-fact table to the driver)
            err_row = (
                truth.join(
                    prev_truth.select(*FACT_KEYS, F.col("truth").alias("t_old")),
                    FACT_KEYS,
                )
                .agg(
                    F.sqrt(F.sum((F.col("truth") - F.col("t_old")) ** 2)).alias("num"),
                    F.sqrt(F.sum(F.col("t_old") ** 2)).alias("den"),
                )
                .collect()[0]
            )
            if err_row["den"] and err_row["num"] / err_row["den"] <= tol:
                break
        prev_truth = truth

    rescaled = (
        truth.join(prior, FACT_KEYS)
        .join(fact_stats, FACT_KEYS)
        .select(
            *FACT_KEYS,
            (F.col("truth") * F.col("sigma_e") + F.col("prior")).alias("truth_num"),
        )
    )
    num_truth = snap_to_claimed(original, rescaled)
    weights = sigma2.select(*WEIGHT_KEYS, F.col("sigma2").alias("weight"))
    return FusionResult(truth=assemble_truth(None, num_truth), weights=weights)
