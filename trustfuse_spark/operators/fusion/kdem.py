"""KDEm (kernel-density truth embedding) — per-fact kernel math in
applyInPandas, global source-reliability updates as DataFrame aggregations.

Reference semantics (kdem.py, verified):
  numeric-only. Per fact i with claims x and per-claim opinion weights w:
    K_jk   = k((x_j - x_k)/h)          (Gaussian default, exp(-u^2)/sqrt(2pi))
    norm_j = K_jj - 2 (Kw)_j + w'Kw    (clipped at 0)
  c update (per source, per bucket):
    rtn_s = Σ_facts norm_j / len(fact)
    j_obj = Σ rtn                       (objective; stop on |Δj/j| <= tol)
    c_s   = -ln((rtn_s / count_s) / j_obj)    for rtn_s > 0, else 0
  w update (per fact): w_j ∝ c[source_j] masked to norm_j > 0, normalized;
    if the masked sum is 0, uniform over norm_j == 0 entries.

Pinned divergences (documented):
  * bandwidth h: the reference sets self.h once from the FIRST fact's MAD
    and reuses it globally, order-dependent across facts AND buckets
    (kdem.py:52-54, SURVEY §7.4.4). We pin "first" = smallest fact key.
  * output: the reference returns truth=c_vec / weights=w_m, shapes that
    break its own get_results contract (kdem.py:42-45, SURVEY §7.4.3). We
    emit truth = per-fact argmax-w claim (ties -> smaller value) and
    weights = c_vec, which is what the math actually produces.
  * convergence is global (all buckets) rather than per-bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trustfuse_spark.operators.fusion.base import (
    FACT_KEYS,
    WEIGHT_KEYS,
    FusionResult,
    argmax_per_fact,
    assemble_truth,
    CheckpointRotator,
    checkpoint,
)

_NORM_SCHEMA = T.StructType(
    [
        T.StructField("bucket_id", T.IntegerType()),
        T.StructField("entity", T.StringType()),
        T.StructField("attr", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("value_num", T.DoubleType()),
        T.StructField("norm", T.DoubleType()),
        T.StructField("flen", T.IntegerType()),
        T.StructField("w", T.DoubleType()),
    ]
)


def _kernel(u: np.ndarray, method: str) -> np.ndarray:
    if method == "gaussian":
        return np.exp(-(u**2)) / np.sqrt(2 * np.pi)
    if method == "uniform":
        return (np.abs(u) <= 1) / 2.0
    if method in ("epanechnikov", "ep"):
        return 3 / 4 * (1 - u**2) * (np.abs(u) <= 1)
    if method in ("biweight", "bi"):
        return 15 / 16 * (1 - u**2) ** 2 * (np.abs(u) <= 1)
    if method in ("triweight", "tri"):
        return 35 / 32 * (1 - u**2) ** 3 * (np.abs(u) <= 1)
    if method == "laplace":
        return np.exp(-np.abs(u))
    raise ValueError(f"unknown kernel {method}")


def mad_bandwidth(x: np.ndarray) -> float:
    """MAD + 1e-10*std, the reference's bandwidth estimator (kdem.py:96-99)."""
    return float(
        np.median(np.abs(x - np.median(x))) + 1e-10 * np.std(x)
    )


def _norms_factory(h: float, method: str):
    """Per-fact kernel norms, batched MANY FACTS PER ARROW GROUP.

    applyInPandas keyed directly on the fact would ship one tiny Arrow
    batch + one Python roundtrip per fact (~10-claim groups: measured 31 s
    at sf0.1 where the math itself is milliseconds). The caller instead
    groups on a hash bucket of the fact key and this function loops the
    facts inside one pandas batch — identical per-fact float math, ~100x
    fewer Arrow/Python crossings, and the bucket count scales with
    parallelism, not with |facts|."""

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [f.name for f in _NORM_SCHEMA.fields]
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        # ONE global sort, then contiguous numpy slices per fact: a pandas
        # groupby sub-frame per fact costs ~1.5 ms of frame bookkeeping vs
        # ~20 us for the actual <=n^2 kernel math (measured 11.7 s vs 0.3 s
        # on 7.5k facts). Within-fact order (source, value_num) is identical
        # to the old per-group sort, so the float results are bit-equal.
        pdf = pdf.sort_values(
            ["bucket_id", "entity", "attr", "source", "value_num"]
        ).reset_index(drop=True)
        change = (
            pdf["bucket_id"].ne(pdf["bucket_id"].shift())
            | pdf["entity"].ne(pdf["entity"].shift())
            | pdf["attr"].ne(pdf["attr"].shift())
        ).to_numpy()
        change[0] = True
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(pdf))
        x_all = pdf["value_num"].to_numpy(dtype="float64")
        w_all = pdf["w"].to_numpy(dtype="float64")
        norm_all = np.empty(len(pdf), dtype="float64")
        flen_all = np.empty(len(pdf), dtype="int32")
        k0 = _kernel(np.array(0.0), method)
        for s, e in zip(starts, ends):
            x = x_all[s:e]
            w = w_all[s:e]
            n = e - s
            if h > 0:
                k = _kernel((x[:, None] - x[None, :]) / h, method)
            else:
                k = np.full((n, n), k0)
            kw = k @ w
            norm = np.diag(k) - 2 * kw + float(w @ kw)
            norm_all[s:e] = np.where(norm < 0, 0.0, norm)
            flen_all[s:e] = n
        out = pdf[["bucket_id", "entity", "attr", "source", "value_num", "w"]].copy()
        out["norm"] = norm_all
        out["flen"] = flen_all
        return out[cols]

    return compute


def fuse_kdem(
    claims: DataFrame,
    max_itr: int = 99,
    tol: float = 1e-5,
    method: str = "gaussian",
    h: float = -1.0,
    numeric_only: bool = True,
) -> FusionResult:
    if numeric_only:
        claims = claims.filter(F.col("claim_type") == "quantity")
    base = checkpoint(
        claims.filter(F.col("value_num").isNotNull()).select(
            *FACT_KEYS, "source", "value_num"
        )
    )
    if h < 0:
        first_key = base.orderBy(*FACT_KEYS).select(*FACT_KEYS).first()
        first_vals = (
            base.filter(
                (F.col("bucket_id") == first_key[0])
                & (F.col("entity") == first_key[1])
                & (F.col("attr") == first_key[2])
            )
            .select("value_num")
            .toPandas()["value_num"]
            .to_numpy(dtype="float64")
        )
        h = mad_bandwidth(first_vals)

    counts = (
        base.select(*WEIGHT_KEYS, *FACT_KEYS)
        .distinct()
        .groupBy(*WEIGHT_KEYS)
        .agg(F.count("*").alias("cnt"))
    )
    flen = Window.partitionBy(*FACT_KEYS)
    weighted = base.withColumn(
        "w", 1.0 / F.count("*").over(flen)
    )  # init uniform per fact
    compute_norms = _norms_factory(h, method.lower())

    prev_j: dict[int, float] | None = None
    rot_n = CheckpointRotator(claims.sparkSession)
    rot_c = CheckpointRotator(claims.sparkSession)
    c_vec = None
    # fact-hash bucket count scales with cores, not |facts| (see
    # _norms_factory); xxhash64 keeps co-fact rows in one pandas batch
    n_fb = max(claims.sparkSession.sparkContext.defaultParallelism * 4, 8)
    fb = F.pmod(F.xxhash64("entity", "attr"), F.lit(n_fb))
    for _ in range(max_itr):
        norms = rot_n.rotate(
            weighted.withColumn("__fb", fb)
            .groupBy("bucket_id", "__fb")
            .applyInPandas(compute_norms, _NORM_SCHEMA)
        )
        rtn = (
            norms.groupBy(*WEIGHT_KEYS)
            .agg(F.sum(F.col("norm") / F.col("flen")).alias("rtn"))
        )
        jdf = rtn.groupBy("bucket_id").agg(F.sum("rtn").alias("j"))
        c_vec = (
            rtn.join(jdf, "bucket_id")
            .join(counts, WEIGHT_KEYS)
            .select(
                *WEIGHT_KEYS,
                F.when(
                    F.col("rtn") > 0,
                    -F.log((F.col("rtn") / F.col("cnt")) / F.col("j")),
                )
                .otherwise(F.lit(0.0))
                .alias("c"),
            )
        )
        c_vec = rot_c.rotate(c_vec)
        cur_j = {r["bucket_id"]: r["j"] for r in jdf.collect()}
        # w update: mask to norm>0, normalize within fact; all-masked ->
        # uniform over norm==0 entries (reference update_w)
        masked = norms.join(F.broadcast(c_vec), WEIGHT_KEYS).withColumn(
            "wi", F.when(F.col("norm") > 0, F.col("c")).otherwise(F.lit(0.0))
        )
        fact_sum = F.sum("wi").over(flen)
        fallback = F.when(F.col("norm") == 0, F.lit(1.0)).otherwise(F.lit(0.0))
        fb_sum = F.sum(fallback).over(flen)
        weighted = masked.select(
            *FACT_KEYS,
            "source",
            "value_num",
            F.when(fact_sum > 0, F.col("wi") / fact_sum)
            .otherwise(fallback / fb_sum)
            .alias("w"),
        )
        if prev_j is not None:
            errs = [
                abs((cur_j[b] - prev_j[b]) / prev_j[b])
                for b in cur_j
                if b in prev_j and prev_j[b]
            ]
            if errs and max(errs) <= tol:
                prev_j = cur_j
                break
        prev_j = cur_j

    assert c_vec is not None, "max_itr must be >= 1"
    final = argmax_per_fact(
        weighted.withColumn("vkey", F.col("value_num")), F.col("w"), "vkey"
    ).select(*FACT_KEYS, F.col("value_num").alias("truth_num"))
    return FusionResult(
        truth=assemble_truth(None, final),
        weights=c_vec.select(*WEIGHT_KEYS, F.col("c").alias("weight")),
    )
