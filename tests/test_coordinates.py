"""Coordinate claim type: parse -> per-axis fusion -> recompose.

The reference never fuses coordinate facts (tuple claims match neither
isinstance branch, crh.py:46/50 — truth stays None); per-axis fusion is our
documented improvement (operators/coordinates.py module docstring).
"""

import pyspark.sql.functions as F

from trustfuse_spark.api import ClaimsDataset
from trustfuse_spark.functions.preprocess import (
    coordinate_lat,
    coordinate_lon,
    format_coordinate,
)
from trustfuse_spark.operators.coordinates import (
    expand_coordinate_claims,
    recompose_coordinate_truth,
)

CLAIM_COLS = "bucket_id int, source string, entity string, attr string, value_str string, value_num double, claim_type string"


def _claims(spark, rows):
    return spark.createDataFrame(rows, CLAIM_COLS)


def test_parse_and_format_roundtrip(spark):
    df = spark.createDataFrame(
        [("(48.858333, 2.294167)",), ("(-12.5, 0.25)",), ("garbage",), ("(1,)",)],
        "s string",
    )
    out = df.select(
        coordinate_lat(F.col("s")).alias("lat"),
        coordinate_lon(F.col("s")).alias("lon"),
    ).collect()
    assert (out[0]["lat"], out[0]["lon"]) == (48.858333, 2.294167)
    assert (out[1]["lat"], out[1]["lon"]) == (-12.5, 0.25)
    assert out[2]["lat"] is None and out[3]["lat"] is None
    rt = df.limit(2).select(
        format_coordinate(coordinate_lat(F.col("s")), coordinate_lon(F.col("s"))).alias("r"),
        "s",
    ).collect()
    assert all(r["r"] == r["s"] for r in rt)


def test_expand_recompose_majority(spark):
    rows = [
        (0, "s1", "e1", "loc", "(10.0, 20.0)", None, "coordinate"),
        (0, "s2", "e1", "loc", "(10.0, 20.0)", None, "coordinate"),
        (0, "s3", "e1", "loc", "(30.0, 40.0)", None, "coordinate"),
        (0, "s1", "e1", "name", "tower", None, "string"),
    ]
    claims = _claims(spark, rows)
    expanded = expand_coordinate_claims(claims)
    # 3 coordinate claims -> 6 axis rows; string claim passes through
    assert expanded.filter(F.col("attr") == "loc::lat").count() == 3
    assert expanded.filter(F.col("attr") == "name").count() == 1
    assert (
        expanded.filter(F.col("attr") == "loc::lon")
        .filter(F.col("value_num") == 40.0)
        .count()
        == 1
    )

    ds = ClaimsDataset.from_long(claims, attr_types={"loc": "coordinate"})
    res = ds.fuse("crh", max_itr=2)
    truth = {r["attr"]: r["value_str"] for r in res.truth.collect()}
    # majority pair wins on both axes -> recomposed exactly
    assert truth["loc"] == "(10.0, 20.0)"
    assert truth["name"] == "tower"
    # no axis attrs leak into the recomposed truth
    assert not [a for a in truth if "::" in a]


def test_recompose_passthrough_only(spark):
    truth = spark.createDataFrame(
        [(0, "e1", "height", "324.0", 324.0, True)],
        "bucket_id int, entity string, attr string, value_str string, value_num double, is_numeric boolean",
    )
    out = recompose_coordinate_truth(truth).collect()
    assert len(out) == 1 and out[0]["attr"] == "height"
