import json, sys, time
sys.path.insert(0, "/root/repo")
from trustfuse_spark.session import get_spark
from trustfuse_spark.datagen import gen_docs
from trustfuse_spark.plans.pipeline import docs_to_claims, truth_to_triples
from trustfuse_spark.operators.fusion.crh import _truth_step, _weight_step
from trustfuse_spark.operators.fusion.base import (
    FACT_KEYS, checkpoint, fact_stddev, median_per_fact, mode_per_fact, split_claims, assemble_truth)
import pyspark.sql.functions as F

cores = int(sys.argv[1]); E = int(sys.argv[2])
spark = get_spark(app_name=f"phase_{cores}", master=f"local[{cores}]", shuffle_partitions=64,
                  extra_conf={"spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={cores}"})
spark.range(1000).count()
docs = gen_docs(spark, n_entities=E, n_sources=20, n_revs=4, num_partitions=64).localCheckpoint(eager=True)
docs.count()
t = {}
t0 = time.perf_counter()
claims = checkpoint(docs_to_claims(docs).select("bucket_id","source","entity","attr","value_str","value_num","claim_type"))
t["extract_ckpt"] = round(time.perf_counter()-t0, 1)
cat, num = split_claims(claims)
num_with_denom = num.join(fact_stddev(num, 0.1), FACT_KEYS)
all_sources = claims.select("bucket_id","source").distinct()
t0 = time.perf_counter()
cat_truth = mode_per_fact(cat); num_truth = median_per_fact(num)
for i in range(3):
    ti = time.perf_counter()
    weights = checkpoint(_weight_step(cat, num_with_denom, cat_truth, num_truth, all_sources))
    cat_truth, num_truth = _truth_step(cat, num_with_denom, weights)
    t[f"iter{i}"] = round(time.perf_counter()-ti, 1)
t0 = time.perf_counter()
truth = checkpoint(assemble_truth(cat_truth, num_truth))
t["final_truth"] = round(time.perf_counter()-t0, 1)
t0 = time.perf_counter()
n = truth_to_triples(truth).count()
t["triples_count"] = round(time.perf_counter()-t0, 1)
t["total"] = round(sum(v for v in t.values()), 1)
print(json.dumps({"cores": cores, "E": E, "phases": t}))
