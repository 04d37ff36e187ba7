"""Deterministic synthetic data for tests + benchmarks (no external data).

Implements FIXTURES.md: an interleaved text+media ``docs`` table
(doc_id, spans:array<struct<kind,text,media_ref,offset>>) whose text spans
render conflicting claims, plus the long-form ``claims`` table, ``gt`` and
``source_truth`` oracles — all pure functions of (seed-free integer hashing of
entity/source/attr indices), so output is identical across partition counts
and parallelism levels. Generation happens in Spark expressions over
``spark.range`` (no driver-side materialization) so the same generator scales
to benchmark size.

Shape mirrors the reference's conflicting-claims datasets
(reference: dataset.py:60-64 claim tables; generate_buckets.py bucketing;
settings.py:110-126 entity keys) without copying any code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

M31 = 2147483647  # 2**31 - 1, keeps all hash arithmetic inside int64

_SPAN_ARRAY_T = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"

N_ATTRS = 6
ATTR_NAMES = ["P_ent0", "P_ent1", "P_ent2", "P_qty", "P_str", "P_time"]
ATTR_TYPES = ["entity", "entity", "entity", "quantity", "string", "time"]
N_WRONG = 3  # planted wrong values per (entity, attr)
EPOCH0 = 1577836800  # 2020-01-01T00:00:00Z
REV_GAP_S = 30 * 24 * 3600  # revisions 30 days apart -> distinct temporal buckets


def _mix(*cols: Column | int) -> Column:
    """Deterministic int64 mixer, reproducible in numpy for oracles."""
    out = F.lit(1469598103).cast("long")
    for c in cols:
        c = F.lit(c) if isinstance(c, int) else c.cast("long")
        out = ((out + c + 1) * F.lit(2654435761)) % F.lit(M31)
    return out


def mix_py(*vals: int) -> int:
    """Python twin of :func:`_mix` for test oracles."""
    out = 1469598103
    for v in vals:
        out = ((out + int(v) + 1) * 2654435761) % M31
    return out


def _entity_name(e: Column) -> Column:
    return F.concat(F.lit("Q"), (e + 1000).cast("string"))


def _entity_surface(e: Column) -> Column:
    """Name-like mention surface for linking tests: distinctive hash chunk +
    index, so same-entity typo variants are Jaro-close while cross-entity
    surfaces are Jaro-far (QIDs would all collide at 0.8+ similarity)."""
    return F.concat(
        F.lit("ent"),
        F.lpad((_mix(e, 83) % 100000000).cast("string"), 8, "0"),
        F.lit("n"),
        e.cast("string"),
    )


def _noisy_surface(e: Column, s: Column, r: Column) -> Column:
    """~20% of docs render the entity with a deterministic typo (trailing
    duplicate char) — the linking stage must merge these back."""
    clean = _entity_surface(e)
    return F.when(_mix(e, s, r, 71) % 5 == 0, F.concat(clean, F.lit("x"))).otherwise(clean)


def _source_name(s: Column) -> Column:
    return F.concat(F.lit("src_"), F.lpad(s.cast("string"), 4, "0"))


def _p_true_pct(s: Column) -> Column:
    """Planted source reliability in percent: 95, 90, ... 55 cycling."""
    return (F.lit(95) - (s % 9) * 5).cast("long")


def _true_value_idx(e: Column, a: Column) -> Column:
    return _mix(e, a, 17) % 1000


def _wrong_value_idx(tv: Column, j: Column) -> Column:
    """j-th planted wrong value index for a fact with true index tv.

    Spread far from tv (offsets ~1/8..1/2 of the value space) so numeric
    conflicts scatter instead of hugging the truth — squared-loss models
    (CRH numeric, CATD, GTM) legitimately pick an adjacent claimed value
    otherwise, which no truth-discovery model could distinguish.
    """
    return (tv + 129 + j * 173) % 1000


def _value_str(e: Column, a: Column, vidx: Column) -> Column:
    """Render a claim value for attr index ``a`` with value index ``vidx``.

    Types per ATTR_TYPES: entity attrs -> linked QIDs; quantity -> number with
    unit-noise variants (exercises scale_units-style normalization,
    reference: preprocessing.py:176-225); string -> token w/ whitespace noise
    (reference: remove_space preprocessing.py:168-173); time -> H:MM clock
    (reference: extract_time preprocessing.py:86-103).
    """
    num = (vidx % 900 + 100).cast("long")  # 100..999
    variant = _mix(e, a, vidx, 23) % 3
    return (
        F.when(a < 3, F.concat(F.lit("Q"), (50000 + vidx).cast("string")))
        .when(
            a == 3,
            F.when(variant == 0, F.concat(num.cast("string"), F.lit(" m")))
            .when(variant == 1, F.concat((num * 100).cast("string"), F.lit(" cm")))
            .otherwise(F.concat(F.lit("+"), num.cast("string"), F.lit("metre"))),
        )
        .when(
            a == 4,
            F.when(variant == 0, F.concat(F.lit(" name_"), vidx.cast("string"), F.lit(" ")))
            .otherwise(F.concat(F.lit("name_"), vidx.cast("string"))),
        )
        .otherwise(  # time "H:MM"
            F.concat(
                (vidx % 24).cast("string"),
                F.lit(":"),
                F.lpad((vidx % 60).cast("string"), 2, "0"),
            )
        )
    )


def _value_num(a: Column, vidx: Column) -> Column:
    """Canonical numeric value (post-normalization) for quantity/time attrs."""
    return (
        F.when(a == 3, (vidx % 900 + 100).cast("double"))
        .when(a == 5, ((vidx % 24) * 60 + vidx % 60).cast("double"))
        .otherwise(F.lit(None).cast("double"))
    )


def _claim_cols(df: DataFrame) -> DataFrame:
    """Given columns (e, s, a) add claim columns. Core conflict-injection.

    present: ~70% of (source, entity, attr) cells are non-null.
    correct: source claims the planted true value w.p. its reliability,
    else one of N_WRONG planted wrong values.
    """
    e, s, a = F.col("e"), F.col("s"), F.col("a")
    df = (
        df.withColumn("present", (_mix(e, s, a, 5) % 100) >= 30)
        .withColumn("is_true", (_mix(e, s, a, 7) % 100) < _p_true_pct(s))
        .withColumn("tv", _true_value_idx(e, a))
        .withColumn("wrong_j", _mix(e, s, a, 11) % N_WRONG)
    )
    vidx = F.when(F.col("is_true"), F.col("tv")).otherwise(
        _wrong_value_idx(F.col("tv"), F.col("wrong_j"))
    )
    return (
        df.withColumn("vidx", vidx)
        .withColumn("attr", F.element_at(F.lit(ATTR_NAMES), (a + 1).cast("int")))
        .withColumn("claim_type", F.element_at(F.lit(ATTR_TYPES), (a + 1).cast("int")))
        .withColumn("value_str", _value_str(e, a, F.col("vidx")))
        .withColumn("value_num", _value_num(a, F.col("vidx")))
        .withColumn("entity", _entity_name(e))
        .withColumn("source", _source_name(s))
    )


def gen_claims(
    spark: SparkSession, n_entities: int = 200, n_sources: int = 20, n_revs: int = 4
) -> DataFrame:
    """Long-form conflicting-claims table (FIXTURES.md §2).

    Columns: bucket_id, source, entity, attr, value_str, value_num,
    claim_type, ts. Attr ``a`` is claimed in revision ``a % n_revs`` by every
    source that covers it; bucket_id == revision index.
    """
    base = (
        spark.range(n_entities * n_sources * N_ATTRS)
        .withColumn("e", (F.col("id") / (n_sources * N_ATTRS)).cast("long"))
        .withColumn("s", (F.col("id") / N_ATTRS).cast("long") % n_sources)
        .withColumn("a", F.col("id") % N_ATTRS)
        .withColumn("r", F.col("id") % N_ATTRS % n_revs)
    )
    df = _claim_cols(base).filter(F.col("present"))
    ts = F.to_timestamp(
        F.from_unixtime(
            F.lit(EPOCH0)
            + F.col("r") * REV_GAP_S
            + (_mix(F.col("e"), F.col("s"), 41) % 3600)
        )
    )
    return df.select(
        F.col("r").cast("int").alias("bucket_id"),
        "source",
        "entity",
        "attr",
        "value_str",
        "value_num",
        "claim_type",
        ts.alias("ts"),
    )


def _mix_sql(*args: str | int) -> str:
    """SQL-text twin of :func:`_mix` — identical arithmetic, emitted as one
    string so plan construction costs O(1) py4j calls instead of one per
    expression node (measured: gen_docs built its Column tree in ~5s of
    pure driver-side py4j chatter, re-paid by every query that generates
    docs)."""
    out = "CAST(1469598103 AS BIGINT)"
    for c in args:
        out = f"((({out} + {c}) + 1) * 2654435761) % 2147483647"
    return out


def gen_docs(
    spark: SparkSession,
    n_entities: int = 200,
    n_sources: int = 20,
    n_revs: int = 4,
    num_partitions: int | None = None,
    entity_noise: bool = False,
) -> DataFrame:
    """Interleaved docs table (FIXTURES.md §1 / BASELINE input_hint).

    One doc per (entity, source, revision); its text spans render the claims
    of that revision as "<entity> | <attr> | <value>"; 0-2 media spans are
    interleaved deterministically. Offsets strictly increase.

    entity_noise=True renders name-like mention surfaces with deterministic
    typos in ~20% of docs — the linking/canonicalization stage's test input
    (resolve with gen_entity_dictionary to get back QIDs).

    The span expressions are emitted as SQL text (`F.expr`) rather than
    nested Column calls: the values are IDENTICAL (same arithmetic, same
    casts — pinned by tests/test_datagen_sql.py's node-for-node comparison
    against the Column formulation), but the whole plan costs three py4j
    calls instead of thousands. Per-attr branches of the value renderer are
    folded in Python because ``a`` is a loop literal — the same folding
    Catalyst would do, done before the tree exists.
    """
    n_rows = n_entities * n_sources * n_revs
    docs = (
        spark.range(0, n_rows, 1, num_partitions or spark.sparkContext.defaultParallelism)
        .withColumn("e", (F.col("id") / (n_sources * n_revs)).cast("long"))
        .withColumn("s", (F.col("id") / n_revs).cast("long") % n_sources)
        .withColumn("r", F.col("id") % n_revs)
    )
    if entity_noise:
        clean = (
            "concat('ent', lpad(CAST(" + _mix_sql("e", 83) + " % 100000000 AS STRING),"
            " 8, '0'), 'n', CAST(e AS STRING))"
        )
        entity_repr = (
            f"CASE WHEN ({_mix_sql('e', 's', 'r', 71)} % 5) = 0"
            f" THEN concat({clean}, 'x') ELSE {clean} END"
        )
    else:
        entity_repr = "concat('Q', CAST(e + 1000 AS STRING))"

    empty = f"CAST(array() AS {_SPAN_ARRAY_T})"

    def value_sql(a_i: int, vidx: str) -> str:
        variant = f"({_mix_sql('e', a_i, f'({vidx})', 23)} % 3)"
        if a_i < 3:
            return f"concat('Q', CAST(50000 + ({vidx}) AS STRING))"
        if a_i == 3:
            num = f"(({vidx}) % 900 + 100)"
            return (
                f"CASE WHEN {variant} = 0 THEN concat(CAST({num} AS STRING), ' m')"
                f" WHEN {variant} = 1 THEN concat(CAST({num} * 100 AS STRING), ' cm')"
                f" ELSE concat('+', CAST({num} AS STRING), 'metre') END"
            )
        if a_i == 4:
            return (
                f"CASE WHEN {variant} = 0"
                f" THEN concat(' name_', CAST(({vidx}) AS STRING), ' ')"
                f" ELSE concat('name_', CAST(({vidx}) AS STRING)) END"
            )
        return (
            f"concat(CAST(({vidx}) % 24 AS STRING), ':',"
            f" lpad(CAST(({vidx}) % 60 AS STRING), 2, '0'))"
        )

    # Text spans: one per attr assigned to this revision (a % n_revs == r) and
    # present for this (e, s, a), as concat of conditional single-item arrays
    # (codegen-friendly; higher-order filter() is interpreted).
    span_structs = []
    for a_i in range(N_ATTRS):
        present = (
            f"(({_mix_sql('e', 's', a_i, 5)} % 100) >= 30)"
            f" AND (({a_i % n_revs}) = r)"
        )
        is_true = (
            f"({_mix_sql('e', 's', a_i, 7)} % 100)"
            f" < CAST(95 - (s % 9) * 5 AS BIGINT)"
        )
        tv = f"({_mix_sql('e', a_i, 17)} % 1000)"
        wrong_j = f"({_mix_sql('e', 's', a_i, 11)} % {N_WRONG})"
        vidx = (
            f"CASE WHEN {is_true} THEN {tv}"
            f" ELSE ({tv} + 129 + {wrong_j} * 173) % 1000 END"
        )
        text = (
            f"concat({entity_repr}, ' | ', '{ATTR_NAMES[a_i]}', ' | ',"
            f" {value_sql(a_i, vidx)})"
        )
        span_structs.append(
            f"CASE WHEN {present} THEN array(named_struct("
            f"'kind', 'text', 'text', {text}, 'media_ref', '',"
            f" 'offset', CAST({a_i} AS INT))) ELSE {empty} END"
        )
    # 0-2 media spans with deterministic refs, offsets after the text block
    n_media = f"({_mix_sql('e', 's', 'r', 13)} % 3)"
    for m_i in range(2):
        mref = (
            f"concat('mref://', CAST({_mix_sql('e', 's', 'r', 29 + m_i)}"
            f" % 100000 AS STRING))"
        )
        span_structs.append(
            f"CASE WHEN {n_media} > {m_i} THEN array(named_struct("
            f"'kind', 'media', 'text', '', 'media_ref', {mref},"
            f" 'offset', CAST({N_ATTRS + m_i} AS INT))) ELSE {empty} END"
        )
    spans = "concat(" + ", ".join(span_structs) + ")"
    doc_id = (
        "concat('d', lpad(CAST(e AS STRING), 6, '0'),"
        " '_', lpad(CAST(s AS STRING), 4, '0'),"
        " '_', lpad(CAST(r AS STRING), 2, '0'))"
    )
    ts = (
        f"to_timestamp(from_unixtime({EPOCH0} + r * {REV_GAP_S}"
        f" + ({_mix_sql('e', 's', 41)} % 3600)))"
    )
    return (
        docs.select(
            F.expr(doc_id).alias("doc_id"),
            F.expr(spans).alias("spans"),
            F.expr(ts).alias("ts"),
        )
        .filter(F.size("spans") > 0)
    )


def gen_gt(spark: SparkSession, n_entities: int = 200) -> DataFrame:
    """Ground truth (FIXTURES.md §3): planted true value per (entity, attr)."""
    base = (
        spark.range(n_entities * N_ATTRS)
        .withColumn("e", (F.col("id") / N_ATTRS).cast("long"))
        .withColumn("a", F.col("id") % N_ATTRS)
    )
    e, a = F.col("e"), F.col("a")
    tv = _true_value_idx(e, a)
    return base.select(
        _entity_name(e).alias("entity"),
        F.element_at(F.lit(ATTR_NAMES), (a + 1).cast("int")).alias("attr"),
        F.array(_value_str(e, a, tv)).alias("gt_values"),
        _value_num(a, tv).alias("gt_num"),
    )


def gen_entity_dictionary(spark: SparkSession, n_entities: int = 200) -> DataFrame:
    """(label=clean surface, qid) dim for dictionary linking after
    canonicalization of the noisy surfaces."""
    base = spark.range(n_entities)
    e = F.col("id")
    return base.select(
        _entity_surface(e).alias("label"), _entity_name(e).alias("qid")
    )


def gen_partial_orders(spark: SparkSession, n_entities: int = 200) -> DataFrame:
    """Specificity dimension (FIXTURES.md §4): for 1 in 5 entity-typed attrs
    a 3-level chain root < mid < leaf where mid = the planted true value.
    coeff = depth / max_depth (reference dataset.py:398-434)."""
    base = (
        spark.range(n_entities * 3)  # entity attrs a in {0,1,2}
        .withColumn("e", (F.col("id") / 3).cast("long"))
        .withColumn("a", F.col("id") % 3)
        .filter(_mix(F.col("e"), F.col("a"), 61) % 5 == 0)
    )
    e, a = F.col("e"), F.col("a")
    tv = _true_value_idx(e, a)
    mid = _value_str(e, a, tv)
    root = F.concat(F.lit("Q"), (40000 + tv).cast("string"))
    leaf = F.concat(F.lit("Q"), (60000 + tv).cast("string"))
    attr = F.element_at(F.lit(ATTR_NAMES), (a + 1).cast("int"))
    rows = []
    for depth, val, is_leaf in ((0, root, False), (1, mid, False), (2, leaf, True)):
        rows.append(
            base.select(
                attr.alias("attr"),
                val.alias("value"),
                F.lit(depth).alias("depth"),
                (F.lit(depth) / 2.0).alias("coeff"),
                F.lit(is_leaf).alias("leaf"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def gen_source_truth(spark: SparkSession, n_sources: int = 20) -> DataFrame:
    """Planted reliabilities (FIXTURES.md §5) for weight rank-correlation tests."""
    return spark.range(n_sources).select(
        _source_name(F.col("id")).alias("source"),
        (_p_true_pct(F.col("id")) / 100.0).alias("p_true"),
    )
