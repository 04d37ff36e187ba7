"""Structured Streaming twins of the batch temporal operators.

The reference is batch (buckets are temporal windows over a finished revision
history, SURVEY §2.9), so batch-over-table is the faithful mapping — these
streaming variants are the forward-looking surface for live claim streams:

  stream_session_buckets : session_window(ts, gap) + watermark — the
      streaming equivalent of operators/bucketize.sessionize
  stream_claim_counts    : windowed per-(entity, attr) claim aggregation
      with late-data watermark
  stream_majority        : incremental majority vote per fact (update mode)
  stream_sessionize_stateful : the EXACT batch alpha/delta bucket-close
      rule (generate_buckets.py:171-270) as an incremental
      applyInPandasWithState operator — bucket ids identical to
      operators/bucketize.sessionize under in-order delivery
      (pytest-gated across multi-micro-batch replays)

All take any streaming DataFrame with (source, entity, attr, value_str, ts);
tests drive them with a rate/memory source through foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType


def stream_session_buckets(
    claims: DataFrame, gap: str = "10 days", watermark: str = "1 day"
) -> DataFrame:
    """Session windows per entity: the bucket-closure rule as a native
    session_window (claims separated by > gap fall into new sessions)."""
    return (
        claims.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("entity"))
        .agg(
            F.count("*").alias("n_claims"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select("entity", "w.start", "w.end", "n_claims", "first_ts", "last_ts")
    )


def stream_claim_counts(
    claims: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    return (
        claims.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "entity", "attr")
        .agg(F.count("*").alias("n_claims"), F.countDistinct("source").alias("n_sources"))
        .select("entity", "attr", "w.start", "w.end", "n_claims", "n_sources")
    )


def stream_majority(
    claims: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Incremental vote counts per (window, fact, value); the mode per fact
    is the max-count row downstream (complete/update sink or foreachBatch
    argmax — streaming window functions can't rank, so the argmax runs in
    the sink batch)."""
    return (
        claims.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "entity", "attr", "value_str")
        .agg(F.count("*").alias("votes"))
        .select("entity", "attr", "value_str", "votes", "w.start", "w.end")
    )


def _session_fold_core(tsv, sources, attrs, prior, alpha_s, delta_s):
    """One micro-batch of the two-clock close rule, vectorized and pure.

    tsv: int64 unix seconds, already sorted by (ts, source, attr);
    sources/attrs: parallel key arrays; prior: state tuple (bucket,
    last_ts, pair_src, pair_attr, pair_ts) or None. Returns (buckets,
    new_state). Kept module-level and Spark-free so the incremental ==
    batch invariant is property-testable without a session (pytest drives
    it over randomized histories and micro-batch splits).

    Pair keys are reduced to integer codes with sort-based np.unique and
    every group operation runs on the codes — NEVER on strings or tuples:
    pandas' hash-based groupby/index paths treat object-dtype strings as
    C strings and silently truncate at an embedded NUL (pandas 2.2 —
    'a\\x00p' and 'a\\x00q' land in one group), which the property test
    caught as per-source instead of per-(source, attr) clocks."""
    import numpy as np
    import pandas as pd

    if prior is not None:
        bucket0, last_ts, pair_src, pair_attr, pair_ts = prior
        pair_last = dict(zip(zip(pair_src, pair_attr), pair_ts))
    else:
        bucket0, last_ts, pair_last = 0, None, {}

    # entity-clock gap: previous row in-batch, seeded from state
    ent_prev = np.empty(len(tsv), dtype="float64")
    ent_prev[0] = float(last_ts) if last_ts is not None else np.nan
    ent_prev[1:] = tsv[:-1]

    # pair-clock gap: per-(source, attr) previous claim. Codes via
    # comparison-based unique (NUL-safe); seeds looked up per UNIQUE pair.
    pairs = np.fromiter(zip(sources, attrs), dtype=object, count=len(tsv))
    uniq, codes = np.unique(pairs, return_inverse=True)
    prev_in_batch = pd.Series(tsv).groupby(codes).shift()
    seed_per_code = np.array(
        [float(pair_last.get(u, np.nan)) for u in uniq], dtype="float64"
    )
    pair_prev = prev_in_batch.fillna(
        pd.Series(seed_per_code[codes])
    ).to_numpy(dtype="float64")

    close = (((tsv - ent_prev) > delta_s) & ~np.isnan(ent_prev)) | (
        ((tsv - pair_prev) > alpha_s) & ~np.isnan(pair_prev)
    )
    buckets = bucket0 + np.cumsum(close.astype("int64"))

    last_per_code = pd.Series(tsv).groupby(codes).max()
    pair_last.update(
        (uniq[c], int(t)) for c, t in last_per_code.items()
    )
    new_state = (
        int(buckets[-1]),
        int(tsv[-1]),
        [k[0] for k in pair_last],
        [k[1] for k in pair_last],
        [int(v) for v in pair_last.values()],
    )
    return buckets, new_state


def stream_sessionize_stateful(
    claims: DataFrame,
    alpha_s: int = 864_000,
    delta_s: int = 63_072_000,
    ts_col: str = "ts",
) -> DataFrame:
    """The reference's exact bucket-close rule (generate_buckets.py:171-270)
    as an incremental stateful streaming operator.

    `session_window` can express only the single-gap close; the reference
    closes on EITHER of two clocks — entity inactive > delta, or the SAME
    (source, attr) pair re-claiming after > alpha — which needs per-pair
    state. This runs the rule with applyInPandasWithState, keyed by entity:

      state = (last bucket id, entity-level last ts,
               per-(source, attr) last ts as parallel arrays)

    Each micro-batch sorts its rows by (ts, source, attr) — the batch
    window order — computes close flags vectorized (entity gap via a
    shifted array seeded from state, pair gap via a groupby shift whose
    per-pair first row is seeded from the state map), and emits the rows
    with bucket_id = state bucket + cumsum(close). Bucket ids are therefore
    IDENTICAL to operators/bucketize.sessionize under in-order delivery
    (the pytest replays the same claims through 1..N micro-batches and
    diffs against the batch path row-for-row).

    One boundary condition sharpens "in-order delivery": the batch window
    breaks timestamp TIES by (source, attr), so rows of one entity sharing
    one timestamp must arrive within ONE micro-batch — split across a
    batch boundary, the stream has already emitted the earlier row's
    bucket before learning a tied row would have sorted before it (e.g.
    an alpha-close at the tied ts assigns the later-arriving tied row a
    bucket one lower than batch order would). Timestamps strictly
    increasing per entity (the revision-history shape) or tie-complete
    micro-batches (e.g. file-per-revision drops) satisfy the contract.

    Scale shape: state per entity is O(distinct (source, attr) pairs) —
    bounded by schema width, not by claim volume — and lives in the state
    store (RocksDB on a cluster), so a hot entity that serializes a batch
    window sort instead streams through constant memory. Out-of-order
    input needs a watermark-buffered pre-stage; this operator assumes
    in-order delivery per entity, matching the revision-history replay the
    reference processes.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = StructType(
        list(claims.schema.fields) + [StructField("bucket_id", IntegerType())]
    )
    state_schema = (
        "bucket INT, last_ts BIGINT, pair_src ARRAY<STRING>, "
        "pair_attr ARRAY<STRING>, pair_ts ARRAY<BIGINT>"
    )
    cols = [f.name for f in claims.schema.fields]

    def fold(key, pdfs, state):
        import pandas as pd

        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values(
            [ts_col, "source", "attr"], kind="mergesort", ignore_index=True
        )
        # unit-safe: Arrow hands pandas datetime64[ns] or [us] depending on
        # version — go through datetime64[s] to get unix seconds either way
        tsv = pdf[ts_col].to_numpy().astype("datetime64[s]").astype("int64")

        prior = state.get if state.exists else None
        buckets, new_state = _session_fold_core(
            tsv, pdf["source"].values, pdf["attr"].values, prior, alpha_s, delta_s
        )
        state.update(new_state)
        out = pdf[cols].copy()
        out["bucket_id"] = buckets.astype("int32")
        yield out

    return claims.groupBy("entity").applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
