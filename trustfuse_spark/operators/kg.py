"""KG post-materialization quality stages: predicate canonicalization and
triple constraint validation.

The reference emits fused (entity, attribute, value) triples verbatim
(generate_subgraph.py triple sets; visualization.py graph build) — a
production KG-construction pipeline additionally (a) maps raw predicate
surface forms onto a canonical ontology and (b) validates triples against
per-predicate constraints before loading (SHACL-lite: object typing,
null/empty objects, dangling entity references).

Scale shapes (100-TB contract):

- ``canonicalize_predicates``: the alias dim is ontology-sized (thousands of
  rows) — an explicit broadcast left join, zero corpus shuffles.
- ``validate_triples``: typing/null checks are pure expressions; the
  dangling-reference check is a left-semi-shaped join of object references
  against the distinct-subject set — at 10^12 triples that subject set is
  itself huge, so this is an honest shuffled join on the node key (AQE
  handles celebrity-node skew), not a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonicalize_predicates(
    triples: DataFrame,
    aliases: DataFrame,
    pred_col: str = "pred",
) -> DataFrame:
    """Map predicate surface forms to canonical ontology predicates.

    ``aliases`` is a (alias, canonical) dim; predicates without an alias row
    keep their surface form. Adds ``pred_canon`` next to the raw predicate.
    """
    dim = F.broadcast(
        aliases.select(F.col("alias").alias(pred_col), F.col("canonical"))
    )
    return triples.join(dim, pred_col, "left").withColumn(
        "pred_canon", F.coalesce(F.col("canonical"), F.col(pred_col))
    ).drop("canonical")


def validate_triples(
    triples: DataFrame,
    numeric_preds: list[str] | None = None,
    ref_preds: list[str] | None = None,
    pred_col: str = "pred_canon",
    obj_col: str = "obj",
    subj_col: str = "subj",
) -> DataFrame:
    """Per-triple constraint flags (SHACL-lite):

    - ``v_null``: object NULL or empty after trim;
    - ``v_numeric``: predicate in ``numeric_preds`` but object not castable
      to double (range typing violation);
    - ``v_dangling``: predicate in ``ref_preds`` (object must reference an
      entity) but the object never occurs as a subject (referential
      integrity).

    ``n_violations`` sums the flags. Null/typing checks are expressions;
    the dangling check joins object references against the distinct-subject
    set — emitted rows keep the input order-free triple identity.
    """
    numeric_preds = numeric_preds or []
    ref_preds = ref_preds or []
    obj = F.col(obj_col)
    out = triples.withColumn(
        "v_null", (obj.isNull() | (F.trim(obj) == "")).cast("int")
    )
    if numeric_preds:
        out = out.withColumn(
            "v_numeric",
            (
                F.col(pred_col).isin(numeric_preds)
                & obj.isNotNull()
                # try_cast: NULL on unparseable, under ANSI and non-ANSI alike
                & F.regexp_replace(obj, ",", "").try_cast("double").isNull()
            ).cast("int"),
        )
    else:
        out = out.withColumn("v_numeric", F.lit(0))
    if ref_preds:
        subjects = triples.select(F.col(subj_col).alias("__ref")).distinct()
        refs = out.withColumn(
            "__ref",
            F.when(F.col(pred_col).isin(ref_preds), obj).otherwise(F.lit(None)),
        )
        resolved = refs.join(
            subjects.withColumn("__hit", F.lit(1)), "__ref", "left"
        )
        out = resolved.withColumn(
            "v_dangling",
            (
                F.col(pred_col).isin(ref_preds)
                & obj.isNotNull()
                & F.col("__hit").isNull()
            ).cast("int"),
        ).drop("__ref", "__hit")
    else:
        out = out.withColumn("v_dangling", F.lit(0))
    return out.withColumn(
        "n_violations", F.col("v_null") + F.col("v_numeric") + F.col("v_dangling")
    )


def to_ntriples(
    triples: DataFrame,
    base_iri: str = "http://example.org/",
    pred_col: str = "pred_canon",
    subj_col: str = "subj",
    obj_col: str = "obj",
    ref_preds: list[str] | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Serialize triples as W3C N-Triples lines (RDF 1.1 N-Triples §2.2):
    subject and predicate as IRIs under ``base_iri``; objects as IRIs for
    predicates in ``ref_preds`` (entity references), else as literals with
    backslash/quote/newline/tab escaped per the spec's ECHAR table.

    Pure string expressions — the sink is ``df.write.text`` ready, one
    column ``ntriple`` (pass ``keep_cols`` to carry source columns next to
    the serialized line, e.g. for validation-flag-filtered exports). The
    reference emits raw triple tuples (generate_subgraph.py); this is the
    interchange-format edge of that surface.
    """
    ref_preds = ref_preds or []

    def iri(col):
        return F.concat(F.lit("<" + base_iri), col, F.lit(">"))

    esc = F.col(obj_col)
    for raw, rep in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")):
        esc = F.replace(esc, F.lit(raw), F.lit(rep))
    literal = F.concat(F.lit('"'), esc, F.lit('"'))
    obj_term = F.when(
        F.col(pred_col).isin(ref_preds) & F.col(obj_col).rlike("^[A-Za-z0-9_]+$"),
        iri(F.col(obj_col)),
    ).otherwise(literal)
    line = F.concat_ws(
        " ", iri(F.col(subj_col)), iri(F.col(pred_col)), obj_term, F.lit(".")
    )
    if keep_cols:
        return triples.select(*keep_cols, line.alias("ntriple"))
    return triples.select(line.alias("ntriple"))


def functional_violations(
    triples: DataFrame,
    functional_preds: list[str],
    pred_col: str = "pred_canon",
    subj_col: str = "subj",
    obj_col: str = "obj",
) -> DataFrame:
    """Functional-property cardinality check (OWL FunctionalProperty /
    SHACL ``sh:maxCount 1``): a predicate declared functional may carry at
    most ONE distinct object per subject — more than one means conflicting
    assertions survived fusion (e.g. two different quantities for the same
    entity across buckets) and the triple needs re-resolution, the KG-side
    twin of the reference's one-truth-per-fact contract.

    Adds per-triple columns: ``n_objects`` — the distinct-object count of
    the triple's (subject, predicate) group for functional predicates, -1
    for non-functional predicates (a sentinel, not NULL, so gate hashes
    stay canonical) — and ``v_functional`` — 1 when the group carries > 1
    distinct object.

    Plan shape: ONE map-side-combined distinct-count agg over the
    functional slice keyed (subject, predicate), joined back on the SAME
    key — the shuffle is co-partitioned with the agg's, and only functional
    triples enter it. No windows, no per-row Python; AQE handles
    celebrity-subject skew on the join.
    """
    is_func = F.col(pred_col).isin(functional_preds)
    g = (
        triples.filter(is_func)
        .groupBy(subj_col, pred_col)
        .agg(F.countDistinct(obj_col).cast("long").alias("n_objects"))
    )
    return (
        triples.join(g, [subj_col, pred_col], "left")
        .withColumn("n_objects", F.coalesce("n_objects", F.lit(-1).cast("long")))
        .withColumn(
            "v_functional", (is_func & (F.col("n_objects") > 1)).cast("int")
        )
    )


def inverse_functional_violations(
    triples: DataFrame,
    inv_functional_preds: list[str],
    pred_col: str = "pred_canon",
    subj_col: str = "subj",
    obj_col: str = "obj",
) -> DataFrame:
    """Inverse-functional cardinality check (OWL InverseFunctionalProperty):
    a predicate declared inverse-functional identifies its subject — an
    object value may belong to at most ONE subject (ISBNs, registry ids,
    canonical URLs). More than one distinct subject per (predicate, object)
    means two fused entities claim the same identifying value — the KG-side
    duplicate-entity signal that feeds entity-resolution re-runs (the
    mirror of `functional_violations`, grouped on the other end).

    Adds per-triple columns ``n_subjects`` (distinct subjects of the
    triple's (predicate, object) group; -1 sentinel on non-IFP predicates)
    and ``v_inv_functional``. Same plan shape as the functional check: one
    map-side-combined distinct-count agg over the IFP slice keyed
    (predicate, object), joined back co-partitioned.
    """
    is_ifp = F.col(pred_col).isin(inv_functional_preds)
    g = (
        triples.filter(is_ifp)
        .groupBy(pred_col, obj_col)
        .agg(F.countDistinct(subj_col).cast("long").alias("n_subjects"))
    )
    return (
        triples.join(g, [pred_col, obj_col], "left")
        .withColumn("n_subjects", F.coalesce("n_subjects", F.lit(-1).cast("long")))
        .withColumn(
            "v_inv_functional", (is_ifp & (F.col("n_subjects") > 1)).cast("int")
        )
    )


def negative_samples(
    edges: DataFrame,
    n_buckets: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
    portable_hash: bool = False,
) -> DataFrame:
    """In-bucket negative sampling for KG-embedding training (the corrupted
    triples a TransE/DistMult-style trainer consumes, Bordes et al. 2013):
    each edge gets a corrupted tail drawn from ANOTHER edge's tail — the
    standard in-batch trick that avoids materializing a dense global entity
    index (whose row_number would be a single-partition sort at 10^12-edge
    scale). Edges hash into ``n_buckets`` groups; within a bucket, ordered
    by (src, dst), each edge takes the NEXT edge's tail, the last wrapping
    to the first — deterministic, partition-invariant, and every window
    runs over a bucket of ~|E|/n_buckets rows (size n_buckets to taste; no
    task ever sorts the whole edge list).

    ``is_collision`` marks the filtered setting: 1 when the corrupted edge
    (src, neg_dst) exists in the graph (incl. the degenerate single-edge
    bucket where neg == own tail) — trainers drop or downweight those.
    Flagging is one left join against the edge set keyed on the corrupted
    pair.

    Portable hash = poly31(src|dst) + one Knuth mix (SQL-replayable);
    production path = xxhash64.
    """
    from pyspark.sql import Window

    from trustfuse_spark.operators.curation import _POLY_M31, _poly31

    key = F.concat_ws("|", src_col, dst_col)
    if portable_hash:
        hm = ((_poly31(key) + 1) * F.lit(2654435761)) % F.lit(_POLY_M31)
    else:
        hm = F.pmod(F.xxhash64(key), F.lit(1 << 62))
    e = edges.select(src_col, dst_col).distinct().withColumn(
        "bucket", (hm % n_buckets).cast("long")
    )
    w = Window.partitionBy("bucket").orderBy(src_col, dst_col)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    neg = e.withColumn(
        "neg_dst",
        F.coalesce(
            F.lead(dst_col).over(w), F.first(dst_col).over(wf)
        ),
    )
    exists = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d"),
        F.lit(1).alias("__hit"),
    ).distinct()
    out = (
        neg.join(
            exists,
            (F.col(src_col) == F.col("__s")) & (F.col("neg_dst") == F.col("__d")),
            "left",
        )
        .withColumn("is_collision", F.coalesce(F.col("__hit"), F.lit(0)))
        .drop("__s", "__d", "__hit")
    )
    return out.select(src_col, dst_col, "bucket", "neg_dst", "is_collision")
