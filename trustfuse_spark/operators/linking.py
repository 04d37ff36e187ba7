"""Entity linking + canonicalization (SURVEY §7.1 stages S2-S3).

The reference's entities arrive pre-canonicalized by Wikidata QIDs
(dataset.py:351-360); its closest machinery is the LMDB qid->label lookup
(generate_conflicting_dataset.py:47-73 — a broadcast dim join here). The
north_star requires the general pipeline: noisy mention surfaces ->
LSH-blocked candidate pairs -> similarity scorer -> connected components ->
canonical entity id.

  candidate_links : MinHash-LSH blocking over surface shingles + Jaro
                    verification (Arrow-batched pandas UDF)
  canonicalize    : connected components over accepted links; canonical id =
                    the lexicographically smallest surface in the component
  link_dictionary : broadcast dim join mention->known entity id (the
                    reference's QID path) with exact-match fast path
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trustfuse_spark.operators.cc import connected_components
from trustfuse_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)
from trustfuse_spark.operators.fusion.truthfinder import jaro_udf


def candidate_links(
    mentions: DataFrame,
    surface_col: str = "surface",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaro: float = 0.85,
) -> DataFrame:
    """Distinct surfaces -> scored candidate pairs (surface_a, surface_b,
    score) with score = Jaro similarity >= min_jaro."""
    surfaces = (
        mentions.select(F.col(surface_col).alias("id"))
        .distinct()
        .withColumn("__txt", F.col("id"))
    )
    # fan_out=False: surfaces sit behind a distinct() shuffle, so the
    # partitioning is already AQE-sized and the _fan_out probe would
    # materialize the upstream stages at plan-build time (dedup.shingles)
    sh = shingles(surfaces, "id", "__txt", n, fan_out=False)
    pairs = lsh_candidate_pairs(
        minhash_signatures(sh, num_hashes), bands, num_hashes // bands
    )
    scored = pairs.withColumn("score", jaro_udf(F.col("id_a"), F.col("id_b")))
    return scored.filter(F.col("score") >= min_jaro).select(
        F.col("id_a").alias("surface_a"),
        F.col("id_b").alias("surface_b"),
        "score",
    )


def canonicalize(
    mentions: DataFrame,
    links: DataFrame,
    surface_col: str = "surface",
    salt_hubs: bool = False,
) -> DataFrame:
    """Attach canonical_id to every mention row.

    Components over surface-similarity links; canonical id = smallest
    surface string of the component (hash to longs first at scale; strings
    keep the test surface readable)."""
    comp = connected_components(
        links, src="surface_a", dst="surface_b", salt_hubs=salt_hubs
    ).select(F.col("node").alias(surface_col), F.col("component").alias("canonical_id"))
    return mentions.join(comp, surface_col, "left").withColumn(
        "canonical_id", F.coalesce("canonical_id", F.col(surface_col))
    )


def link_dictionary(
    mentions: DataFrame,
    dictionary: DataFrame,
    surface_col: str = "surface",
    dict_surface: str = "label",
    dict_id: str = "qid",
) -> DataFrame:
    """Exact-surface dictionary linking (the reference's qid->label dim,
    broadcast): mention surface -> known entity id, null when unknown."""
    dim = F.broadcast(
        dictionary.select(
            F.col(dict_surface).alias(surface_col), F.col(dict_id).alias("linked_id")
        ).dropDuplicates([dict_surface] if dict_surface == surface_col else [surface_col])
    )
    return mentions.join(dim, surface_col, "left")


def edit_distance_pairs(
    df: DataFrame,
    col: str,
    max_len: int = 24,
) -> DataFrame:
    """All DISTINCT value pairs at Levenshtein distance exactly 1 (the
    surface-form typo/variant join entity linking blocks on), via
    FastSS/SymSpell deletion-neighborhood blocking: every value emits its
    single-character-deletion variants PLUS itself; any distance-1 pair —
    substitution (both delete position i), insertion/deletion (the longer's
    variant equals the shorter itself) — collides on a variant, so recall
    is complete BY CONSTRUCTION, and the exact `levenshtein` verify runs on
    candidates only. No similarity-join cartesian anywhere.

    Scale shape: the variant explode is map-side (len+1 rows per value,
    bounded by ``max_len`` — longer values are dropped, documented); the
    candidate join shuffles on the variant string; the verify + distinct
    are candidate-sized. Returns (val_a, val_b, dist=1), val_a < val_b.
    """
    vals = (
        df.select(F.col(col).alias("val"))
        .filter(F.length("val").between(1, max_len))
        .distinct()
    )
    variants = vals.select(
        "val",
        F.explode(
            F.array_union(
                F.transform(
                    F.sequence(F.lit(1), F.length("val")),
                    lambda i: F.concat(
                        F.col("val").substr(F.lit(1), i - 1),
                        F.col("val").substr(i + 1, F.lit(1000)),
                    ),
                ),
                F.array(F.col("val")),
            )
        ).alias("variant"),
    )
    a = variants.select(F.col("val").alias("val_a"), "variant")
    b = variants.select(F.col("val").alias("val_b"), "variant")
    cand = (
        a.join(b, "variant")
        .filter(F.col("val_a") < F.col("val_b"))
        .select("val_a", "val_b")
        .distinct()
    )
    return cand.filter(F.levenshtein("val_a", "val_b") == 1).withColumn(
        "dist", F.lit(1).cast("long")
    )
