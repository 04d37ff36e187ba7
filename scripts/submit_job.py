"""spark-submit entry point (north_rule: `spark-submit --py-files`).

Runs the flagship KG pipeline against a testdata dir and prints one JSON
line — the job a cluster operator would submit, with the engine shipped as
a zip via --py-files (no install on the executors).

Usage:
  cd /root/repo && python -c "import shutil; shutil.make_archive('/tmp/trustfuse_spark', 'zip', '.', 'trustfuse_spark')"
  spark-submit --master 'local[8]' --py-files /tmp/trustfuse_spark.zip \
      scripts/submit_job.py /root/testdata/sf0.01 majority
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    model = sys.argv[2] if len(sys.argv) > 2 else "majority"
    spark = (
        SparkSession.builder.appName("trustfuse_submit")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    # imports AFTER getOrCreate: the zip from --py-files is on sys.path of
    # driver and executors alike
    from trustfuse_spark.datagen import gen_docs
    from trustfuse_spark.plans.pipeline import run_pipeline

    docs = gen_docs(spark, n_entities=200, n_sources=10, n_revs=4)
    t0 = time.perf_counter()
    triples, _ = run_pipeline(docs, model=model)
    n = triples.count()
    wall = round(time.perf_counter() - t0, 2)
    print(json.dumps({"model": model, "n_triples": n, "wall_sec": wall, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
