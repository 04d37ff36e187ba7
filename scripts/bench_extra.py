"""Per-query profiling harness (guide §1): separates CONSTRUCTION time
(driver-side sequential jobs run while building the DataFrame — Lloyd
rounds, BPE merge collects, broadcast-guard counts) from ACTION time (the
one noop-sink execution of the returned plan), and counts the Spark jobs
each phase launched.  bench.py is frozen for measurement; this file is the
workbench.

Usage: python scripts/bench_extra.py [sf_dir] [query ...]   (default: all)
Prints one JSON line per query:
  {"q": name, "build_s": ..., "exec_s": ..., "jobs_build": n, "jobs_exec": n}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]

    import __spark_entry__ as entrymod
    from trustfuse_spark.operators.fusion.base import persistent_rdd_ids, release_rdds
    from trustfuse_spark.session import get_spark

    spark = get_spark(app_name="bench_extra")
    sc = spark.sparkContext
    spark.range(1000).count()

    def n_jobs() -> int:
        return len(sc.statusTracker().getJobIdsForGroup("q") or [])

    qs = entrymod.queries()
    names = only or list(qs)
    baseline_rdds = persistent_rdd_ids(spark)
    for name in names:
        sc.setJobGroup("q", name)
        j0 = n_jobs()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        j1 = n_jobs()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        j2 = n_jobs()
        print(
            json.dumps(
                {
                    "q": name,
                    "build_s": round(t1 - t0, 2),
                    "exec_s": round(t2 - t1, 2),
                    "jobs_build": j1 - j0,
                    "jobs_exec": j2 - j1,
                }
            ),
            flush=True,
        )
        release_rdds(spark, persistent_rdd_ids(spark) - baseline_rdds)


if __name__ == "__main__":
    main()
