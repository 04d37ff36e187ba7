"""Model-math parity: Spark fusion vs independent pandas/numpy oracles."""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from tests.oracle import crh_oracle, majority_oracle, truthfinder_oracle
from trustfuse_spark.datagen import gen_claims
from trustfuse_spark.operators.fusion.crh import fuse_crh
from trustfuse_spark.operators.fusion.majority import fuse_majority
from trustfuse_spark.operators.fusion.truthfinder import fuse_truthfinder


@pytest.fixture(scope="module")
def claims_df(spark):
    return gen_claims(spark, n_entities=25, n_sources=8, n_revs=2).cache()


@pytest.fixture(scope="module")
def claims_pd(claims_df):
    return claims_df.toPandas()


def _spark_truth(result):
    rows = result.truth.collect()
    out = {}
    for r in rows:
        key = (r["bucket_id"], r["entity"], r["attr"])
        out[key] = r["value_num"] if r["is_numeric"] else r["value_str"]
    return out


def _spark_weights(result):
    return {
        (r["bucket_id"], r["source"]): r["weight"] for r in result.weights.collect()
    }


def _compare_truth(got: dict, want: dict, numeric_tol=1e-9):
    assert set(got) == set(want)
    bad = []
    for k, w in want.items():
        g = got[k]
        if isinstance(w, float):
            if abs(g - w) > numeric_tol:
                bad.append((k, g, w))
        elif g != w:
            bad.append((k, g, w))
    assert not bad, f"{len(bad)} truth mismatches, first 5: {bad[:5]}"


def test_majority_matches_oracle(claims_df, claims_pd):
    got = _spark_truth(fuse_majority(claims_df))
    want = majority_oracle(claims_pd)
    _compare_truth(got, want)


def test_crh_matches_oracle(claims_df, claims_pd):
    res = fuse_crh(claims_df, max_itr=3)
    want_truth, want_w = crh_oracle(claims_pd, max_itr=3)
    _compare_truth(_spark_truth(res), want_truth)
    got_w = _spark_weights(res)
    assert set(got_w) == set(want_w)
    for k in want_w:
        assert abs(got_w[k] - want_w[k]) < 1e-6, (k, got_w[k], want_w[k])


def test_truthfinder_matches_oracle(claims_df, claims_pd):
    res = fuse_truthfinder(claims_df, max_itr=3)
    want_truth, want_w = truthfinder_oracle(claims_pd, max_itr=3)
    _compare_truth(_spark_truth(res), want_truth)
    got_w = _spark_weights(res)
    assert set(got_w) == set(want_w)
    for k in want_w:
        assert abs(got_w[k] - want_w[k]) < 1e-6, (k, got_w[k], want_w[k])


def test_partition_count_invariance(spark, claims_pd):
    """SURVEY §5.3.4: fused output independent of physical partitioning."""
    sdf = spark.createDataFrame(claims_pd)
    a = _spark_truth(fuse_crh(sdf.repartition(1), max_itr=2))
    b = _spark_truth(fuse_crh(sdf.repartition(16), max_itr=2))
    _compare_truth(a, b)


def test_crh_partition_count_invariant(spark, claims_df, claims_pd):
    """SURVEY §7.4 risk 1: results must not depend on shuffle order — run
    the same fusion under a prime, tiny partition count and re-compare to
    the oracle."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        res = fuse_crh(claims_df.repartition(5), max_itr=3)
        want_truth, _ = crh_oracle(claims_pd, max_itr=3)
        _compare_truth(_spark_truth(res), want_truth)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
