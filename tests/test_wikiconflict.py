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

    if po.count() > 0:
        spec = specificity(res.truth, ds.gt, po)
        spec.collect()  # runs end-to-end on real partial orders
