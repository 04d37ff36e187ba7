"""CRH truth discovery as iterated DataFrame aggregations.

Re-expresses the reference's per-bucket numpy loops (crh.py:26-103) as one
vectorized dataflow over *all* buckets at once: the fact key is
(bucket_id, entity, attr), the weight key is (bucket_id, source).

Per iteration (reference semantics, verified against crh.py):

  weight step (update_w, crh.py:40-62):
    loss per claim = 1[v != truth]                       (categorical)
                   = (v - truth)^2 / max(std_pop(fact), eps)   (numeric)
    raw_s  = Σ losses of source s within its bucket
    w_s    = -log(raw_s / Σ_bucket raw)  if raw_s > 0 else 0.0
    (zero-loss sources KEEP weight 0 — reference rtn[rtn>0] masking)

  truth step (update_truth, crh.py:65-89):
    categorical: argmax over distinct claimed v of Σ w[claimers of v]
    numeric:     argmin over claimed v of Σ_claims w·(v - claim)^2 / denom
    truth is always snapped to a claimed value, never synthetic.

Init truth = mode / exact median (initialize_truth, crh.py:92-103).
Iterations fixed (reference while itr < max_itr with no convergence break).

Scale notes: claims are cached once; each iteration produces two small-ish
DataFrames (weights: |sources|·|buckets| rows → broadcast join back;
truth: one row per fact → shuffle join on the fact key, AQE skew-handled).
Lineage is truncated every iteration (localCheckpoint; Iceberg snapshot on a
real cluster) so plans stay constant-size across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trustfuse_spark.operators.fusion.base import (
    FACT_KEYS,
    WEIGHT_KEYS,
    CheckpointRotator,
    FusionResult,
    argmax_per_fact,
    argmin_per_fact,
    assemble_truth,
    checkpoint,
    fact_stddev,
    median_per_fact,
    mode_per_fact,
    split_claims,
)


def _weight_step(
    cat: DataFrame,
    num_with_denom: DataFrame,
    cat_truth: DataFrame,
    num_truth: DataFrame,
    all_sources: DataFrame,
) -> DataFrame:
    cat_loss = (
        cat.join(cat_truth, FACT_KEYS)
        .select(
            *WEIGHT_KEYS,
            (F.col("value_str") != F.col("truth_str")).cast("double").alias("loss"),
        )
    )
    num_loss = (
        num_with_denom.join(num_truth, FACT_KEYS)
        .select(
            *WEIGHT_KEYS,
            (
                (F.col("value_num") - F.col("truth_num")) ** 2 / F.col("denom")
            ).alias("loss"),
        )
    )
    raw = (
        cat_loss.unionByName(num_loss)
        .groupBy(*WEIGHT_KEYS)
        .agg(F.sum("loss").alias("raw"))
    )
    # Sources silent in a bucket never enter update_w in the reference either;
    # right-join against the source dim keeps them present with raw=0 so the
    # weights table is total (reference w starts at zeros and stays 0).
    raw = all_sources.join(raw, WEIGHT_KEYS, "left").fillna({"raw": 0.0})
    # Per-bucket normalizer as a broadcast dim, not a window: the window
    # re-shuffled+sorted the |sources|x|buckets| table by bucket_id every
    # iteration; the tiny totals agg reuses raw's exchange (ReusedExchange)
    # and broadcast-joins back — nothing moves but |buckets| rows.
    totals = raw.groupBy("bucket_id").agg(F.sum("raw").alias("__tot"))
    return raw.join(F.broadcast(totals), "bucket_id").select(
        *WEIGHT_KEYS,
        F.when(F.col("raw") > 0, -F.log(F.col("raw") / F.col("__tot")))
        .otherwise(F.lit(0.0))
        .alias("weight"),
    )


def _truth_step(
    cat: DataFrame, num_with_denom: DataFrame, weights: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Unified truth update for both branches in ONE join+groupBy+window.

    Reference semantics (crh.py:65-89): categorical argmax over distinct v
    of Σ w·1[claim=v]; numeric argmin over claimed v of Σ w·(v-claim)²/denom.
    The categorical argmax is identical to an argmin of the complementary
    loss Σ w·1[claim≠v] (the per-fact weight total is candidate-invariant),
    so both branches share candidates = distinct claimed values, loss(cand)
    = Σ_claims w · d(cand, claim), argmin with ascending-value ties — one
    fact-local self-join (rows ≤ claims×distinct per fact, AQE-skew-split)
    instead of two separate aggregation chains.
    """
    bw = F.broadcast(weights)
    cat_u = cat.select(
        *FACT_KEYS, "source",
        F.col("value_str").alias("vkey"),
        F.lit(None).cast("double").alias("vnum"),
        F.lit(None).cast("double").alias("denom"),
        F.lit(False).alias("is_num"),
    )
    num_u = num_with_denom.select(
        *FACT_KEYS, "source",
        F.col("value_num").cast("string").alias("vkey"),
        F.col("value_num").alias("vnum"),
        "denom",
        F.lit(True).alias("is_num"),
    )
    # is_num is part of the fact identity: a fact whose claims mix types
    # (possible via the public claims API; impossible via docs_to_claims)
    # scores its categorical and numeric branches independently and yields
    # one truth row per branch — same as running the two reference branches
    # side by side, and deterministic where F.first("is_num") was not.
    unified = cat_u.unionByName(num_u).join(bw, WEIGHT_KEYS)
    cands = unified.select(
        *FACT_KEYS, "is_num", F.col("vkey").alias("cand"), F.col("vnum").alias("cnum")
    ).distinct()
    loss = F.when(
        F.col("is_num"),
        F.col("weight") * (F.col("cnum") - F.col("vnum")) ** 2 / F.col("denom"),
    ).otherwise(F.col("weight") * (F.col("vkey") != F.col("cand")).cast("double"))
    scored = (
        unified.join(cands, FACT_KEYS + ["is_num"])
        .groupBy(*FACT_KEYS, "is_num", "cand", "cnum")
        .agg(F.sum(loss).alias("loss"))
    )
    # ascending-value ties: numeric by value, categorical by string — cnum
    # sorts numerically where present, vkey lexically otherwise
    w = Window.partitionBy(*FACT_KEYS, "is_num").orderBy(
        F.col("loss").asc(), F.col("cnum").asc_nulls_last(), F.col("cand").asc()
    )
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    cat_truth = best.filter(~F.col("is_num")).select(
        *FACT_KEYS, F.col("cand").alias("truth_str")
    )
    num_truth = best.filter(F.col("is_num")).select(
        *FACT_KEYS, F.col("cnum").alias("truth_num")
    )
    return cat_truth, num_truth


def fuse_crh(
    claims: DataFrame, max_itr: int = 10, eps: float = 0.1
) -> FusionResult:
    """Run CRH over a long-form claims DataFrame (all buckets vectorized).

    Driver-loop efficiency: per iteration we materialize ONLY the weights
    table (|sources|·|buckets| rows — tiny) via localCheckpoint; the truth
    DataFrames stay lazy. Lineage depth stays constant anyway because
    truth_i = f(cached claims, checkpointed weights_i) and
    weights_{i+1} = f(cached claims, truth_i) — one materializing job per
    iteration instead of three, and the big per-fact truth table is never
    shuffled to storage mid-loop.
    """
    # Materialize the claims once at the loop root. localCheckpoint (not
    # cache): a cached-but-unmaterialized extraction lineage makes every
    # iteration's plan re-derive through the full upstream plan — measured
    # 4-6x slower per iteration than iterating over a severed LogicalRDD.
    # On a real cluster this is the stage boundary you'd write to Iceberg.
    claims = checkpoint(claims)
    cat, num = split_claims(claims)
    num_with_denom = num.join(fact_stddev(num, eps), FACT_KEYS)
    all_sources = claims.select(*WEIGHT_KEYS).distinct()

    cat_truth = mode_per_fact(cat)
    num_truth = median_per_fact(num)

    rot = CheckpointRotator(claims.sparkSession)
    weights = None
    for _ in range(max_itr):
        weights = rot.rotate(
            _weight_step(cat, num_with_denom, cat_truth, num_truth, all_sources)
        )
        cat_truth, num_truth = _truth_step(cat, num_with_denom, weights)

    if weights is None:  # max_itr == 0 -> init truth, uniform weights
        weights = all_sources.select(*WEIGHT_KEYS, F.lit(0.0).alias("weight"))

    # materialize the final truth once: every consumer (triples write, eval,
    # weights diagnostics) would otherwise replay the argmax joins
    truth = checkpoint(assemble_truth(cat_truth, num_truth))
    return FusionResult(truth=truth, weights=weights)
