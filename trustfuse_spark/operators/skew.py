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
