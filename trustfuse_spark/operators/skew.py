"""Explicit skew handling for hot keys (north_rule: salting of skewed
entity keys).

AQE's skew-join splitting covers joins; these utilities cover the two
remaining hot-key shapes:

  salted_agg           : two-phase aggregation for ALGEBRAIC aggregates when
                         map-side partial aggregation is disabled or the
                         agg is collect-like (collect_list/set explode on a
                         celebrity entity).
  salted_apply_in_pandas is intentionally absent: a pandas group CANNOT be
                         split transparently — operators needing group-local
                         pairwise math over hot keys must bound the group
                         (e.g. dedup.lsh_candidate_pairs's max_bucket cap)
                         or pre-reduce with salted_agg first.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, GroupedData
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial: list[Column],
    final: Callable[[GroupedData], DataFrame],
    n_salts: int = 32,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase grouped aggregation: phase 1 groups by (keys + salt) —
    spreading a hot key over n_salts reducers — phase 2 merges the partials.

    partial: aggregate columns for phase 1 (must be algebraic: sum/count/
    min/max/collect fragments). final: callback receiving the phase-2
    GroupedData over `keys`, combining the partial columns.

    salt_source: column whose hash picks the salt (defaults to a
    deterministic spread from all non-key columns via xxhash64 of the
    partition-local row; pass a natural column like 'source' for stable
    salting independent of physical layout).
    """
    if salt_source is not None:
        salt = F.pmod(F.xxhash64(salt_source), F.lit(n_salts))
    else:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial)
    return final(phase1.groupBy(*keys))


def salted_count_distinct(
    df: DataFrame, keys: list[str], value: str, n_salts: int = 32
) -> DataFrame:
    """Exact distinct count per hot key without one reducer holding the
    whole key: distinct (keys, value) spread by value-hash, then summed."""
    phase1 = (
        df.withColumn("__salt", F.pmod(F.xxhash64(value), F.lit(n_salts)))
        .groupBy(*keys, "__salt")
        .agg(F.countDistinct(value).alias("__n"))
    )
    return phase1.groupBy(*keys).agg(F.sum("__n").alias(f"n_{value}"))
    # distinct values land in exactly one salt bucket (hash-of-value), so
    # the sum of per-salt distincts is the exact global distinct count


def salted_mode(
    df: DataFrame, keys: list[str], value: str, n_salts: int = 32
) -> DataFrame:
    """Mode per hot key: per-salt (key, value) counts -> merged counts ->
    argmax with ascending-value ties (same pinning as fusion mode)."""
    from pyspark.sql import Window

    counts = (
        df.withColumn("__salt", F.pmod(F.xxhash64(value), F.lit(n_salts)))
        .groupBy(*keys, "__salt", value)
        .agg(F.count("*").alias("__n"))
        .groupBy(*keys, value)
        .agg(F.sum("__n").alias("n"))
    )
    w = Window.partitionBy(*keys).orderBy(F.col("n").desc(), F.col(value).asc())
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join by salt-replication, for when AQE's runtime
    skew splitting is unavailable (static plans, structured streaming
    joins, or an engine pinned below the skew thresholds): the BIG side
    tags each row with a deterministic salt in [0, n_salts), the SMALL
    side replicates every row n_salts times, and the join runs on
    (key, salt) — a celebrity key's rows spread over n_salts shuffle
    partitions instead of one straggler task. Result rows are IDENTICAL to
    the plain join (each big row meets exactly one copy of each matching
    small row).

    Cost: the small side shuffles n_salts-fold — use for genuinely small
    dims only (if it broadcasts, broadcast instead; this is the middle
    regime: too big to broadcast, joined against a skewed fact).

    ``how`` supports 'inner' and 'left' (the unmatched-left rows carry
    exactly one salt, so no duplication).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    bs = big.withColumn("__salt", F.pmod(F.xxhash64(F.col(on)), F.lit(n_salts)))
    ss = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return bs.join(ss, [on, "__salt"], how).drop("__salt")
