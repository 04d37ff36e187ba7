"""Oracle parity for CATD / GTM / ACCU."""

import pytest

from tests.oracle import accu_oracle, catd_oracle, gtm_oracle
from trustfuse_spark.datagen import gen_claims
from trustfuse_spark.operators.fusion.accu import fuse_accu
from trustfuse_spark.operators.fusion.catd import fuse_catd
from trustfuse_spark.operators.fusion.gtm import fuse_gtm


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


def _check(res, want_truth, want_w, w_tol=1e-6):
    got_t = _spark_truth(res)
    assert set(got_t) == set(want_truth)
    bad = [
        (k, got_t[k], want_truth[k])
        for k in want_truth
        if (
            abs(got_t[k] - want_truth[k]) > 1e-9
            if isinstance(want_truth[k], float)
            else got_t[k] != want_truth[k]
        )
    ]
    assert not bad, f"{len(bad)} truth mismatches, first 5: {bad[:5]}"
    got_w = _spark_weights(res)
    assert set(got_w) == set(want_w)
    for k in want_w:
        denom = max(abs(want_w[k]), 1.0)
        assert abs(got_w[k] - want_w[k]) / denom < w_tol, (k, got_w[k], want_w[k])


def test_catd_matches_oracle(claims_df, claims_pd):
    res = fuse_catd(claims_df, max_itr=4, tol=None)
    want_t, want_w = catd_oracle(claims_pd, max_itr=4, tol=None)
    _check(res, want_t, want_w)


def test_catd_convergence_stop(claims_df, claims_pd):
    res = fuse_catd(claims_df, max_itr=10, tol=0.1)
    want_t, want_w = catd_oracle(claims_pd, max_itr=10, tol=0.1)
    _check(res, want_t, want_w)


def test_gtm_matches_oracle(claims_df, claims_pd):
    res = fuse_gtm(claims_df, max_itr=5, tol=None)
    want_t, want_w = gtm_oracle(claims_pd, max_itr=5, tol=None)
    _check(res, want_t, want_w)


def test_accu_matches_oracle(claims_df, claims_pd):
    res = fuse_accu(claims_df, max_itr=3)
    want_t, want_w = accu_oracle(claims_pd, max_itr=3)
    _check(res, want_t, want_w)
