"""Coordinate claims: parse, fuse per-axis, recompose.

The reference stores globecoordinate values as Python tuples
(generate_conflicting_dataset.py:267-271) and its models branch on the
runtime type of the first claim (crh.py:46/50 isinstance str / (float,int));
a tuple matches NEITHER branch, so coordinate facts silently get truth=None
— the 16 WikiConflict coordinate props are never fused by the reference.

This module is a documented IMPROVEMENT over that dead end (same spirit as
the pinned MNAD divergence): each coordinate claim is decomposed into two
quantity claims on synthetic attrs `<attr>::lat` / `<attr>::lon`, fused by
any numeric-capable model, and the per-axis truths recomposed into the
canonical "(lat, lon)" string. Component-wise aggregation (weighted median /
snapped argmin per axis) is the standard streaming estimator for 2-D points;
the recomposed pair may mix axes from different claims when sources disagree
asymmetrically — by construction, and stated here.

Scale shape: expansion is one projection + explode (no extra scan, no
shuffle); recomposition is one groupBy on the fact key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trustfuse_spark.functions.preprocess import (
    coordinate_lat,
    coordinate_lon,
    format_coordinate,
)
from trustfuse_spark.operators.fusion.base import FACT_KEYS, FusionResult

AXIS_SEP = "::"


def expand_coordinate_claims(claims: DataFrame) -> DataFrame:
    """claim_type='coordinate' rows with a parseable '(lat, lon)' value_str
    become TWO quantity rows (attr::lat / attr::lon, value_num = the axis);
    all other rows pass through unchanged. Single pass: conditional array +
    explode, never a union of two filtered scans."""
    lat = coordinate_lat(F.col("value_str"))
    lon = coordinate_lon(F.col("value_str"))
    is_coord = (F.lower(F.col("claim_type")) == "coordinate") & lat.isNotNull()
    row = F.struct(
        F.col("attr").alias("attr"),
        F.col("value_str").alias("value_str"),
        F.col("value_num").alias("value_num"),
        F.col("claim_type").alias("claim_type"),
    )
    axis_rows = F.array(
        F.struct(
            F.concat(F.col("attr"), F.lit(AXIS_SEP), F.lit("lat")).alias("attr"),
            lat.cast("string").alias("value_str"),
            lat.alias("value_num"),
            F.lit("quantity").alias("claim_type"),
        ),
        F.struct(
            F.concat(F.col("attr"), F.lit(AXIS_SEP), F.lit("lon")).alias("attr"),
            lon.cast("string").alias("value_str"),
            lon.alias("value_num"),
            F.lit("quantity").alias("claim_type"),
        ),
    )
    exploded = claims.withColumn(
        "__x", F.explode(F.when(is_coord, axis_rows).otherwise(F.array(row)))
    )
    passthrough = [c for c in claims.columns
                   if c not in ("attr", "value_str", "value_num", "claim_type")]
    return exploded.select(
        *passthrough,
        F.col("__x.attr").alias("attr"),
        F.col("__x.value_str").alias("value_str"),
        F.col("__x.value_num").alias("value_num"),
        F.col("__x.claim_type").alias("claim_type"),
    )


def recompose_coordinate_truth(truth: DataFrame) -> DataFrame:
    """Re-pair fused ::lat / ::lon truths into '(lat, lon)' rows on the
    original attr; non-axis truth rows pass through untouched. Facts missing
    either axis are dropped (cannot happen for claims produced by
    expand_coordinate_claims — every claim emits both)."""
    is_axis = F.col("attr").rlike(f"{AXIS_SEP}(lat|lon)$")
    axis = truth.filter(is_axis).select(
        "bucket_id",
        "entity",
        F.regexp_replace("attr", f"{AXIS_SEP}(lat|lon)$", "").alias("attr"),
        F.regexp_extract("attr", f"{AXIS_SEP}(lat|lon)$", 1).alias("axis"),
        "value_num",
    )
    paired = (
        axis.groupBy(*FACT_KEYS)
        .pivot("axis", ["lat", "lon"])
        .agg(F.first("value_num"))
        .filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
        .select(
            *FACT_KEYS,
            format_coordinate(F.col("lat"), F.col("lon")).alias("value_str"),
            F.lit(None).cast("double").alias("value_num"),
            F.lit(False).alias("is_numeric"),
        )
    )
    rest = truth.filter(~is_axis).select(
        *FACT_KEYS, "value_str", "value_num", "is_numeric"
    )
    return rest.unionByName(paired)


def fuse_with_coordinates(claims: DataFrame, model_fn, **kwargs) -> FusionResult:
    """Wrap any fusion model with coordinate expand/recompose."""
    res = model_fn(expand_coordinate_claims(claims), **kwargs)
    return FusionResult(
        truth=recompose_coordinate_truth(res.truth), weights=res.weights
    )
