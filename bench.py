"""Benchmark runner: headline queries + the KG pipeline at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, "docs_per_sec": ..., ...}

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] cores (default all)
  BENCH_PIPELINE_E    entities for the synthetic docs pipeline bench
                      (default 20000 — large enough that per-stage fixed
                      latency stops dominating docs/s, VERDICT r2 item 8)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = 0.0

    import __spark_entry__ as entrymod
    from trustfuse_spark.datagen import gen_docs
    from trustfuse_spark.operators.fusion.base import persistent_rdd_ids, release_rdds
    from trustfuse_spark.plans.pipeline import run_pipeline
    from trustfuse_spark.session import get_spark

    spark = get_spark(app_name="trustfuse_bench")
    timings: dict[str, float] = {}

    # warm the JVM/codegen paths once with a trivial action
    spark.range(1000).count()

    baseline_rdds = persistent_rdd_ids(spark)
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        _ = n
        # Drop every block this query checkpointed/cached: 26 queries in one
        # session otherwise accumulate dead localCheckpoint RDDs and inflate
        # later queries 6-7x (VERDICT r1 'bench session bloat'). The df is
        # fully consumed by count(); nothing re-reads it.
        release_rdds(spark, persistent_rdd_ids(spark) - baseline_rdds)

    # KG pipeline: synthetic interleaved docs -> extract -> CRH -> triples
    e_cnt = int(os.environ.get("BENCH_PIPELINE_E", "20000"))
    docs = gen_docs(spark, n_entities=e_cnt, n_sources=20, n_revs=4).cache()
    n_docs = docs.count()
    t0 = time.perf_counter()
    triples, _ = run_pipeline(docs, model="crh", max_itr=3)
    n_triples = triples.count()
    pipeline_sec = round(time.perf_counter() - t0, 3)
    timings["kg_pipeline_crh"] = pipeline_sec

    # Corpus-curation pipeline over the same docs: exact dedup -> quality
    # filter -> benchmark decontamination -> hash sample -> sequence packing
    # (plans/curate.py; all stages individually value-gated). Text/source are
    # derived from the cached span docs; the sample draw is the xxhash64
    # scale path, the benchmark a ~0.5% corpus sample's 8-gram prefixes.
    from pyspark.sql import functions as F

    from trustfuse_spark.plans.curate import curate_corpus

    corpus = docs.select(
        "doc_id",
        F.substring("doc_id", 9, 4).alias("source"),
        F.concat_ws(" ", F.transform(
            F.filter(F.col("spans"), lambda s: s["kind"] == "text"),
            lambda s: s["text"])).alias("text"),
    )
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    bench_grams = corpus.filter(F.pmod(F.xxhash64("doc_id"), F.lit(211)) == 0).select(
        F.concat_ws(" ", F.slice(toks, 1, 8)).alias("gram")
    )
    draw = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(1)), F.lit(1000000)) / 1000000.0
    t0 = time.perf_counter()
    packed = curate_corpus(
        corpus, benchmark=bench_grams, min_quality=0.2, default_rate=0.9,
        sample_hash=draw, capacity=2048,
    )
    n_packed = packed.count()
    curation_sec = round(time.perf_counter() - t0, 3)
    timings["curation_pipeline"] = curation_sec

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "docs_per_sec": round(n_docs / pipeline_sec, 1) if pipeline_sec else None,
        "n_packed": n_packed,
        "curation_docs_per_sec": round(n_docs / curation_sec, 1) if curation_sec else None,
        "cores": os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count())),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
