"""Load the reference's actual WikiConflict pickle and fuse it.

Skipped when the reference snapshot isn't present (CI without /root/reference).
"""

import os

import pyspark.sql.functions as F
import pytest

from trustfuse_spark.api import ClaimsDataset
from trustfuse_spark.operators.bucketize import cumulative_bucket
from trustfuse_spark.operators.evaluation import specificity
from trustfuse_spark.sources.wikiconflict import load_wikiconflict

PKL = "/root/reference/data/input_trustfuse/wikiconflict/monuments_in_paris/wikiconflict_subset.pkl"

pytestmark = pytest.mark.skipif(not os.path.exists(PKL), reason="reference data absent")


def test_load_and_fuse_wikiconflict(spark):
    claims, gt, po = load_wikiconflict(spark, PKL)
    assert claims.count() > 0
    assert gt.count() > 0
    assert claims.select("bucket_id").distinct().count() == 20
    # dynamic dataset: evaluate on the cumulative final bucket
    last_bid = claims.agg(F.max("bucket_id")).collect()[0][0]
    cum = cumulative_bucket(claims, last_bid).drop("value_qid")
    ds = ClaimsDataset.from_long(cum, gt.filter(F.col("bucket_id") <= last_bid)).preprocess()
    res = ds.fuse("majority")
    assert res.truth.count() > 0
    m = ds.evaluate(res, per_attr=False).collect()[0]
    # sanity: majority over real conflicting wiki claims recovers a
    # substantial share of the labeled truth
    assert m["p"] > 0.3 and m["r"] > 0.2, dict(m.asDict())

    crh = ds.fuse("crh", max_itr=3)
    m2 = ds.evaluate(crh, per_attr=False).collect()[0]
    assert m2["p"] > 0.3, dict(m2.asDict())

    # partial orders must contain REAL values at per-chain depths, not
    # stringified level-lists (regression: chains were enumerated as levels,
    # so every entry was "['Paris']"-style with depth 0 / coeff 0)
    po_rows = {r["value"]: r for r in po.collect()}
    assert po_rows, "subset pickle carries non-empty value_order chains"
    assert not any(v.startswith("[") for v in po_rows), sorted(po_rows)[:5]
    # known chain from bucket 0: Île-de-France -> Paris -> 7th arrondissement
    assert po_rows["Île-de-France"]["depth"] == 0
    assert po_rows["Île-de-France"]["coeff"] == 0.0
    assert not po_rows["Île-de-France"]["leaf"]
    assert po_rows["7th arrondissement of Paris"]["depth"] == 2
    assert po_rows["7th arrondissement of Paris"]["coeff"] == 1.0
    assert po_rows["7th arrondissement of Paris"]["leaf"]
    assert po_rows["puddle iron"]["depth"] == 1 and po_rows["puddle iron"]["leaf"]
    # depths join real truth values: specificity is non-degenerate
    spec = specificity(res.truth, ds.gt, po)
    spec.collect()  # runs end-to-end on real partial orders


def test_wikiconflict_coordinate_prop(spark):
    """One of the 16 coordinate props fuses to a parseable '(lat, lon)'
    truth instead of an opaque tuple-string (reference drops these facts)."""
    from trustfuse_spark.functions.preprocess import coordinate_lat

    claims, gt, _ = load_wikiconflict(spark, PKL)
    last_bid = claims.agg(F.max("bucket_id")).collect()[0][0]
    cum = cumulative_bucket(claims, last_bid).drop("value_qid")
    coord_claims = cum.filter(F.col("attr") == "coordinate location")
    assert coord_claims.count() > 0, "subset carries coordinate-location claims"
    ds = ClaimsDataset.from_long(
        cum, attr_types={"coordinate location": "coordinate"}
    ).preprocess()
    res = ds.fuse("crh", max_itr=2)
    fused = res.truth.filter(F.col("attr") == "coordinate location")
    rows = fused.withColumn("lat", coordinate_lat(F.col("value_str"))).collect()
    assert rows, "coordinate facts produce truth rows (reference emits none)"
    assert all(r["lat"] is not None for r in rows), [r["value_str"] for r in rows]
    # Eiffel Tower (Q243) fuses to its claimed coordinates
    q243 = [r for r in rows if r["entity"] == "Q243"]
    assert q243 and 48.0 < q243[0]["lat"] < 49.0
