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

from pyspark.sql import DataFrame
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


def _flag_claims(cat: DataFrame, num_with_denom: DataFrame) -> DataFrame:
    """Static union of both claim branches with a type flag — built ONCE
    before the loop so every iteration's loss computation is a single join
    on (fact key, branch) instead of two joins + a union (one exchange less
    per iteration; the per-iteration fixed latency is what caps scaling
    efficiency at small per-core work, BENCH/BASELINE.md)."""
    c = cat.select(
        *FACT_KEYS,
        "source",
        F.lit(False).alias("__isnum"),
        "value_str",
        F.lit(None).cast("double").alias("value_num"),
        F.lit(1.0).alias("denom"),
    )
    n = num_with_denom.select(
        *FACT_KEYS,
        "source",
        F.lit(True).alias("__isnum"),
        F.lit(None).cast("string").alias("value_str"),
        "value_num",
        "denom",
    )
    return c.unionByName(n)


def _truth_union(cat_truth: DataFrame, num_truth: DataFrame) -> DataFrame:
    return cat_truth.select(
        *FACT_KEYS,
        F.lit(False).alias("__isnum"),
        "truth_str",
        F.lit(None).cast("double").alias("truth_num"),
    ).unionByName(
        num_truth.select(
            *FACT_KEYS,
            F.lit(True).alias("__isnum"),
            F.lit(None).cast("string").alias("truth_str"),
            "truth_num",
        )
    )


def _weight_step(
    claims_flagged: DataFrame,
    cat_truth: DataFrame,
    num_truth: DataFrame,
    all_sources: DataFrame,
) -> DataFrame:
    loss_expr = F.when(
        F.col("__isnum"),
        (F.col("value_num") - F.col("truth_num")) ** 2 / F.col("denom"),
    ).otherwise((F.col("value_str") != F.col("truth_str")).cast("double"))
    raw = (
        claims_flagged.join(
            _truth_union(cat_truth, num_truth), [*FACT_KEYS, "__isnum"]
        )
        .select(*WEIGHT_KEYS, loss_expr.alias("loss"))
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
    """Truth update WITHOUT the candidate x claim self-join.

    Reference semantics (crh.py:65-89): categorical argmax over distinct v
    of sum w*1[claim=v]; numeric argmin over claimed v of
    sum w*(v-claim)^2/denom. Both collapse to per-fact aggregates — the
    100 TB shape:

      categorical: argmax_v sum w*1[claim=v] is just the weight sum per
        claimed value (the reference's own formula — no candidate join).
      numeric: sum w*(c-v)^2/d = A - 2cB + c^2*C with A=sum(w*v^2)/d,
        B=sum(w*v)/d, C=sum(w)/d — three sums per fact, then a projection
        over the distinct claimed values (algebraically identical loss).

    The round-1 implementation materialized the claims x candidates
    fan-out (up to |sources|^2 rows per fact) and its iterations scaled at
    ~0.5 efficiency 2->8 cores; this shape is one grouped agg + one
    fact-key join per branch. Argmax/argmin run as min_by over
    struct(score, value) — a hash aggregate with map-side partial combine —
    instead of a row_number window, which re-sorted the fact partition
    every iteration (round 3; same pinned ascending-value ties).
    Mixed-type facts score branches independently (one truth row per
    branch).
    """
    bw = F.broadcast(weights)
    cat_scored = (
        cat.join(bw, WEIGHT_KEYS)
        .groupBy(*FACT_KEYS, "value_str")
        .agg(F.sum("weight").alias("wsum"))
    )
    cat_truth = cat_scored.groupBy(*FACT_KEYS).agg(
        F.min_by(
            "value_str", F.struct((-F.col("wsum")).alias("k1"), F.col("value_str"))
        ).alias("truth_str")
    )

    numw = num_with_denom.join(bw, WEIGHT_KEYS).select(
        *FACT_KEYS, "value_num", "denom", "weight"
    )
    aggs = numw.groupBy(*FACT_KEYS).agg(
        F.sum(F.col("weight") * F.col("value_num") ** 2 / F.col("denom")).alias("__A"),
        F.sum(F.col("weight") * F.col("value_num") / F.col("denom")).alias("__B"),
        F.sum(F.col("weight") / F.col("denom")).alias("__C"),
    )
    cands = numw.select(*FACT_KEYS, "value_num").distinct()
    loss = (
        F.col("__A")
        - 2 * F.col("value_num") * F.col("__B")
        + F.col("value_num") ** 2 * F.col("__C")
    )
    num_truth = (
        cands.join(aggs, FACT_KEYS)
        .groupBy(*FACT_KEYS)
        .agg(
            F.min_by(
                "value_num", F.struct(loss.alias("k1"), F.col("value_num"))
            ).alias("truth_num")
        )
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
    claims_flagged = _flag_claims(cat, num_with_denom)

    cat_truth = mode_per_fact(cat)
    num_truth = median_per_fact(num)

    rot = CheckpointRotator(claims.sparkSession)
    weights = None
    for _ in range(max_itr):
        weights = rot.rotate(
            _weight_step(claims_flagged, cat_truth, num_truth, all_sources)
        )
        cat_truth, num_truth = _truth_step(cat, num_with_denom, weights)

    if weights is None:  # max_itr == 0 -> init truth, uniform weights
        weights = all_sources.select(*WEIGHT_KEYS, F.lit(0.0).alias("weight"))

    # materialize the final truth once: every consumer (triples write, eval,
    # weights diagnostics) would otherwise replay the argmax joins
    truth = checkpoint(assemble_truth(cat_truth, num_truth))
    return FusionResult(truth=truth, weights=weights)
