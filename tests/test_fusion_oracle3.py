"""Oracle parity for KDEm / SLiMFast + determinism checks for LTM."""

import pyspark.sql.functions as F
import pytest

from tests.oracle import kdem_oracle, slimfast_oracle
from trustfuse_spark.datagen import gen_claims, gen_gt
from trustfuse_spark.operators.fusion.kdem import fuse_kdem
from trustfuse_spark.operators.fusion.ltm import fuse_ltm
from trustfuse_spark.operators.fusion.slimfast import fuse_slimfast


@pytest.fixture(scope="module")
def claims_df(spark):
    return gen_claims(spark, n_entities=25, n_sources=8, n_revs=2).cache()


@pytest.fixture(scope="module")
def claims_pd(claims_df):
    return claims_df.toPandas()


def _spark_truth(result):
    return {
        (r["bucket_id"], r["entity"], r["attr"]): (
            r["value_num"] if r["is_numeric"] else r["value_str"]
        )
        for r in result.truth.collect()
    }


def _spark_weights(result):
    return {(r["bucket_id"], r["source"]): r["weight"] for r in result.weights.collect()}


def test_kdem_matches_oracle(claims_df, claims_pd):
    res = fuse_kdem(claims_df, max_itr=4, tol=1e-5)
    want_t, want_w = kdem_oracle(claims_pd, max_itr=4, tol=1e-5)
    got_t = _spark_truth(res)
    assert set(got_t) == set(want_t)
    bad = [(k, got_t[k], want_t[k]) for k in want_t if abs(got_t[k] - want_t[k]) > 1e-9]
    assert not bad, bad[:5]
    got_w = _spark_weights(res)
    for k in want_w:
        assert abs(got_w[k] - want_w[k]) / max(abs(want_w[k]), 1.0) < 1e-6, (
            k, got_w[k], want_w[k],
        )


def test_slimfast_matches_oracle(claims_df, claims_pd):
    res = fuse_slimfast(claims_df, max_itr=3)
    want_t, want_w = slimfast_oracle(claims_pd, max_itr=3)
    got_t = _spark_truth(res)
    assert set(got_t) == set(want_t)
    bad = []
    for k in want_t:
        w = want_t[k]
        g = got_t[k]
        if isinstance(w, float):
            if abs(g - w) > 1e-9:
                bad.append((k, g, w))
        elif g != w:
            bad.append((k, g, w))
    assert not bad, bad[:5]
    got_w = _spark_weights(res)
    for k in want_w:
        assert abs(got_w[k] - want_w[k]) < 1e-9, (k, got_w[k], want_w[k])


def test_ltm_deterministic_and_sane(spark, claims_df):
    """LTM is sampler-based: assert seeded determinism across partitionings
    and truth quality against planted GT (most posterior mass on true values)."""
    r1 = fuse_ltm(claims_df.repartition(2), max_itr=40, seed=7)
    r2 = fuse_ltm(claims_df.repartition(16), max_itr=40, seed=7)
    # truth is multi-valued (one row per accepted value) -> compare as sets
    def tset(res):
        return {
            (r["bucket_id"], r["entity"], r["attr"], r["value_str"])
            for r in res.truth.collect()
        }

    assert tset(r1) == tset(r2)
    # accepted values should predominantly match the planted truth
    gt = gen_gt(claims_df.sparkSession, 25).withColumn(
        "gt", F.trim(F.element_at("gt_values", 1))
    )
    truth = r1.truth.filter(~F.col("is_numeric"))
    joined = truth.join(gt, ["entity", "attr"]).select(
        (F.col("value_str") == F.col("gt")).cast("double").alias("ok")
    )
    acc = joined.agg(F.avg("ok")).collect()[0][0]
    assert acc and acc >= 0.8, f"LTM planted accuracy {acc}"


def test_ltm_posterior_mean_separates_planted_truth(spark):
    """The derandomized LTM (synchronous posterior-mean updates — the
    driver-gated variant) must push a value claimed '1' by most sources far
    above a value only one source states, and be exactly deterministic
    across partitionings (no RNG anywhere)."""
    from trustfuse_spark.operators.fusion.ltm import ltm_posterior_mean

    rows = []
    # 6 sources agree on v=1.0 for e0..e9; s_bad alone claims v=2.0
    for e in range(10):
        for s in range(6):
            rows.append((0, f"s{s}", f"e{e}", "a", "1.0", 1.0, "quantity"))
        rows.append((0, "s_bad", f"e{e}", "a", "2.0", 2.0, "quantity"))
    claims = spark.createDataFrame(
        rows,
        "bucket_id int, source string, entity string, attr string,"
        " value_str string, value_num double, claim_type string",
    )
    post = {
        (r["entity"], r["vkey"]): r["posterior"]
        for r in ltm_posterior_mean(claims, iters=2).collect()
    }
    for e in range(10):
        assert post[(f"e{e}", "1.0")] > 0.9, post[(f"e{e}", "1.0")]
        assert post[(f"e{e}", "2.0")] < post[(f"e{e}", "1.0")]
    # determinism across partitionings (bit-exact: no sampler state)
    p2 = {
        (r["entity"], r["vkey"]): r["posterior"]
        for r in ltm_posterior_mean(claims.repartition(16), iters=2).collect()
    }
    assert post == p2
