"""Full north-star path: noisy surfaces -> LSH link -> CC canonicalize ->
dictionary resolve -> fusion -> P/R vs planted GT."""

import pyspark.sql.functions as F

from trustfuse_spark.datagen import gen_docs, gen_entity_dictionary, gen_gt
from trustfuse_spark.operators.evaluation import evaluate, overall
from trustfuse_spark.plans.pipeline import canonicalize_claims, docs_to_claims, run_pipeline

E, S, R = 40, 10, 2


def test_canonicalization_merges_typos(spark):
    docs = gen_docs(spark, E, S, R, entity_noise=True).cache()
    claims = docs_to_claims(docs)
    n_surfaces = claims.select("entity").distinct().count()
    assert n_surfaces > E  # noise created extra surfaces
    dictionary = gen_entity_dictionary(spark, E)
    canon = canonicalize_claims(claims, min_jaro=0.9, dictionary=dictionary)
    resolved = canon.select("entity").distinct()
    assert resolved.count() == E  # every typo variant merged + resolved
    assert all(r["entity"].startswith("Q") for r in resolved.collect())


def test_linked_pipeline_pr_gate(spark):
    docs = gen_docs(spark, E, S, R, entity_noise=True).cache()
    dictionary = gen_entity_dictionary(spark, E)
    triples, result = run_pipeline(
        docs, model="majority", link_entities=True, entity_dictionary=dictionary
    )
    claims = docs_to_claims(docs)
    gt = gen_gt(spark, E)
    # facts exist per (bucket, Qid, attr); derive from the canonical claims
    canon = canonicalize_claims(claims, min_jaro=0.9, dictionary=dictionary)
    fact_buckets = canon.select("bucket_id", "entity", "attr").distinct()
    gt_b = gt.join(fact_buckets, ["entity", "attr"]).withColumn(
        "gt_values", F.transform("gt_values", lambda x: F.trim(x))
    )
    cat_truth = result.truth.filter(~F.col("is_numeric"))
    m = evaluate(cat_truth, gt_b.filter(F.col("gt_num").isNull()), canon)
    row = overall(m).collect()[0]
    assert row["p"] >= 0.95, f"linked-pipeline precision {row['p']}"
    assert row["r"] >= 0.90, f"linked-pipeline recall {row['r']}"
    assert triples.count() > 0
