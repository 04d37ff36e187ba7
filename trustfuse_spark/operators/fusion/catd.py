"""CATD (confidence-aware truth discovery) as iterated DataFrame aggregations.

Reference semantics (catd.py, verified):
  numeric-only model (settings.py MODEL_PARAMETERS: numeric=True ->
  quantity-type attrs only).

  init: w = 1 per source; truth = exact median per fact.
  iterate (<= max_itr, stop when ||w_old - w|| / ||w_old|| <= tol):
    weight: raw_s = Σ_facts (v - truth)^2
            w_s = chi2.cdf(0.025, count_s) / raw_s   (raw > 0)
            w_s = 1e10                               (raw == 0)
            count_s = #facts the source participates in
    truth:  per fact weighted mean Σ w·v / Σ w
  final: snap truth to the nearest claimed value (ties -> smaller value).

Convergence is evaluated globally across all buckets (max per-bucket err)
— the reference stops each bucket independently inside its per-bucket loop;
post-convergence extra iterations are fixed-point no-ops to float precision,
and the fixed-iteration mode (tol=None) is exactly reproducible.

chi2.cdf(0.025, k) has no Spark builtin; it is evaluated on the tiny
per-source weights table via an Arrow-batched pandas UDF implementing the
regularized lower incomplete gamma P(k/2, 0.0125) by series expansion
(converges in a handful of terms for x = 0.0125).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from trustfuse_spark.operators.fusion.base import (
    FACT_KEYS,
    WEIGHT_KEYS,
    FusionResult,
    assemble_truth,
    CheckpointRotator,
    checkpoint,
    median_per_fact,
    snap_to_claimed,
)


def _gammainc_lower_reg(a: np.ndarray, x: float) -> np.ndarray:
    """Regularized lower incomplete gamma P(a, x) for small x via the series
    P(a,x) = x^a e^-x Σ_{n>=0} x^n / Γ(a+n+1)."""
    out = np.zeros_like(a, dtype="float64")
    lg = np.vectorize(math.lgamma)
    log_term = a * math.log(x) - x - lg(a + 1.0)
    term = np.exp(log_term)
    total = term.copy()
    for n in range(1, 60):
        term = term * x / (a + n)
        total += term
        if np.all(term < 1e-18):
            break
    out[:] = total
    return out


@pandas_udf(T.DoubleType())
def chi2_cdf_0025(k: pd.Series) -> pd.Series:
    """chi-square CDF at x=0.025 with k degrees of freedom = P(k/2, 0.0125)."""
    a = k.to_numpy(dtype="float64") / 2.0
    return pd.Series(_gammainc_lower_reg(a, 0.0125))


def fuse_catd(
    claims: DataFrame,
    max_itr: int = 10,
    tol: float | None = 0.1,
    numeric_only: bool = True,
    zero_tol: float = 1e-9,
) -> FusionResult:
    """zero_tol: residual sums below this count as the reference's exact
    raw == 0 (-> weight 1e10). Float summation order across shuffles leaves
    ~1e-22 residue where numpy gets an exact 0; an explicit tolerance is the
    shuffle-stable equivalent (SURVEY §7.4 risk 1)."""
    if numeric_only:
        claims = claims.filter(F.col("claim_type") == "quantity")
    claims = checkpoint(
        claims.filter(F.col("value_num").isNotNull()).select(
            *FACT_KEYS, "source", "value_num"
        )
    )
    # count_s: #facts per source (a source claiming a fact twice counts once)
    counts = (
        claims.select(*WEIGHT_KEYS, *FACT_KEYS)
        .distinct()
        .groupBy(*WEIGHT_KEYS)
        .agg(F.count("*").alias("cnt"))
    )
    truth = median_per_fact(claims)  # lazy
    rot = CheckpointRotator(claims.sparkSession)
    weights = None
    prev_w: DataFrame | None = None
    for _ in range(max_itr):
        raw = (
            claims.join(truth, FACT_KEYS)
            .groupBy(*WEIGHT_KEYS)
            .agg(F.sum((F.col("value_num") - F.col("truth_num")) ** 2).alias("raw"))
        )
        weights = rot.rotate(
            raw.join(counts, WEIGHT_KEYS)
            .select(
                *WEIGHT_KEYS,
                F.when(
                    F.col("raw") > zero_tol, chi2_cdf_0025(F.col("cnt")) / F.col("raw")
                )
                .otherwise(F.lit(1e10))
                .alias("weight"),
            )
        )
        # truth: per-fact weighted mean over broadcast weights
        truth = (
            claims.join(F.broadcast(weights), WEIGHT_KEYS)
            .groupBy(*FACT_KEYS)
            .agg((F.sum(F.col("weight") * F.col("value_num")) / F.sum("weight")).alias("truth_num"))
        )
        if tol is not None:
            if prev_w is not None:
                err_row = (
                    weights.join(
                        prev_w.select(*WEIGHT_KEYS, F.col("weight").alias("w_old")),
                        WEIGHT_KEYS,
                    )
                    .agg(
                        F.sqrt(F.sum((F.col("weight") - F.col("w_old")) ** 2)).alias("num"),
                        F.sqrt(F.sum(F.col("w_old") ** 2)).alias("den"),
                    )
                    .collect()[0]
                )
                if err_row["den"] and err_row["num"] / err_row["den"] <= tol:
                    prev_w = weights
                    break
            prev_w = weights

    assert weights is not None
    num_truth = snap_to_claimed(claims, truth)
    return FusionResult(truth=assemble_truth(None, num_truth), weights=weights)
