"""Temporal operators: as-of join and point-in-time snapshots.

KG construction over revisioned sources is inherently temporal — the
reference carries per-bucket revision timestamps and evaluates cumulative
states (conflict_data_handling.py bucket carry; SURVEY §2.9) — and any
event/claim stream eventually needs "the latest dimension row at or before
this timestamp" (rates, labels, schema versions, model checkpoints).

Spark has no built-in as-of join. The naive form — a range join
``l.ts >= r.ts`` + argmax — explodes to |L|x|R| per key before pruning.
The scale-correct form used here is the TAGGED-UNION + WINDOW plan:

1. union left and right rows on the shared key with a side tag, right
   payload packed into one struct column (NULL on left rows);
2. one shuffle keyed by the join key, ordered by (ts, side) with right
   BEFORE left at equal ts (so direction='backward' is inclusive);
3. a running ``last(payload, ignorenulls=True)`` window carries the most
   recent right payload forward onto every left row;
4. keep left rows, unpack the struct, optionally null out matches older
   than ``tolerance`` seconds.

Cost: ONE exchange + ONE in-partition sort over |L|+|R| rows — the same
price as a regular join on the key, independent of how many right rows
precede each left row. Skewed keys are ordinary sort-skew (AQE handles
the exchange; the window is a linear scan per key, no quadratic blowup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_sec: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row with
    the LARGEST ``right_ts`` <= ``left_ts`` within the same ``on`` key
    (inclusive — a right row at exactly ``left_ts`` matches).

    All right non-key, non-ts columns come back suffixed with ``suffix``,
    plus ``<right_ts><suffix>`` (the matched timestamp, NULL when no right
    row precedes the left row or the match is older than ``tolerance_sec``).
    Left rows are never dropped (left-outer semantics, as-of flavored).

    Ties inside the right table at the same (key, ts) resolve to the last
    row under a deterministic total order on the packed payload struct —
    supply unique (key, ts) on the right for fully pinned semantics.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in set(keys)]
    if right_ts in payload_cols:
        payload_cols.remove(right_ts)

    # pack the right payload (+ its ts) into one struct; left rows carry NULL
    rstruct = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in payload_cols],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        rstruct.alias("__payload"),
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    r = r.withColumn(
        "__lrow", F.lit(None).cast(l.schema["__lrow"].dataType)
    ).select("__lrow", *[c for c in l.columns if c != "__lrow"])
    both = l.unionByName(r)

    # right rows sort BEFORE left rows at equal ts => inclusive backward
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__payload").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    match = F.col("__match")
    if tolerance_sec is not None:
        too_old = (
            F.col("__ts").cast("double") - match["__rts"].cast("double")
        ) > F.lit(float(tolerance_sec))
        match = F.when(match.isNotNull() & ~too_old, F.col("__match"))

    out_cols = [F.col("__lrow")[c].alias(c) for c in left.columns]
    out_cols.append(match["__rts"].alias(f"{right_ts}{suffix}"))
    out_cols.extend(match[c].alias(f"{c}{suffix}") for c in payload_cols)
    return carried.select(*out_cols)


def snapshot_asof(
    claims: DataFrame,
    as_of,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Point-in-time state: the latest row per key with ``ts_col`` <=
    ``as_of`` — the KG-snapshot query over a revision/claim log (the batch
    twin of the reference's cumulative bucket carry, SURVEY §2.9 J5).

    One filter (partition-prunable when the log is date-partitioned) + one
    ``max_by``-struct hash agg; ties at the same ts resolve by the row's
    deterministic struct order (last wins), matching :func:`asof_join`.
    """
    key_cols = key_cols or ["entity", "attr"]
    rest = [c for c in claims.columns if c not in set(key_cols)]
    live = claims.filter(F.col(ts_col) <= F.lit(as_of))
    picked = live.groupBy(*key_cols).agg(
        F.max(
            F.struct(F.col(ts_col).alias("__ts"), *[F.col(c) for c in rest])
        ).alias("__row")
    )
    return picked.select(
        *key_cols, *[F.col("__row")[c].alias(c) for c in rest]
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention over an event stream: users cohort by the
    ISO week (Monday-truncated) of their FIRST event; for every
    (cohort_week, week offset) the distinct returning users and the
    retained fraction of the cohort — the standard engagement matrix, and
    for a corpus pipeline the "does this source keep producing" signal.

    Scale shape: one map-side-combined min agg per user (first event), one
    distinct on (user, week), one shuffle join on the user key to attach
    cohorts, and a final (cohort, offset) count agg with the cohort-size
    dim joined back BROADCAST — no windows, no per-row Python. Offsets are
    exact day-diffs / 7 (both truncations are Monday-start, so every diff
    is a whole number of weeks).

    Returns (cohort_week, offset_weeks, n_users, retention) — offset 0 rows
    carry retention 1.0 by construction.
    """
    firsts = events.groupBy(F.col(user_col).alias("user")).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    actives = events.select(
        F.col(user_col).alias("user"),
        F.date_trunc("week", F.col(ts_col)).alias("week"),
    ).distinct()
    joined = actives.join(firsts, "user").select(
        "cohort_week",
        (F.datediff("week", "cohort_week") / 7).cast("long").alias("offset_weeks"),
        "user",
    )
    ret = joined.groupBy("cohort_week", "offset_weeks").agg(
        F.countDistinct("user").alias("n_users")
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.countDistinct("user").alias("cohort_size")
    )
    return ret.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "offset_weeks",
        "n_users",
        F.round(F.col("n_users") / F.col("cohort_size"), 6).alias("retention"),
    )
