"""Graph-analytics scaling evidence: the iterative-join shape (PageRank
power iteration + k-core peel + degree-oriented triangle count) at two
pinned parallelism levels on the same synthesized edge list.

The KG-pipeline matrix (bench_scaling.py) prices extraction + fusion; this
cell prices the round-5 graph family, whose per-round dataflow — one
frontier/edge join + one hash agg, localCheckpoint-rotated — is the shape
a 10^12-edge entity graph runs at cluster scale. Same methodology:
taskset-pinned fresh JVM per level, ActiveProcessorCount told the truth,
median of N repeats, every raw wall kept.

Usage: python scripts/bench_scaling_graph.py [--edges 3000000]
       [--cores 2,8] [--repeats 3] [--out scaling_r5_graph.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
from pyspark.sql import functions as F
from trustfuse_spark.session import get_spark
from trustfuse_spark.operators.graph import k_core, pagerank, triangle_stats

cores = {cores}
spark = get_spark(app_name=f"gscale_{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions={partitions},
                  extra_conf={{"spark.driver.extraJavaOptions":
                               f"-XX:ActiveProcessorCount={{cores}}"}})
spark.range(1000).count()  # JVM warm
# deterministic skewed digraph: 20% of edge sources concentrate on 100 hub
# nodes (the celebrity-skew a KG entity graph carries), the rest uniform
N = {edges}
V = max(1000, N // 20)
h = F.xxhash64("id")
src_id = F.when(F.pmod(h, F.lit(5)) == 0, F.pmod(h, F.lit(100))).otherwise(
    F.pmod(h, F.lit(V)))
e = (spark.range(N, numPartitions={partitions})
     .select(
         F.concat(F.lit("n"), src_id.cast("string")).alias("src"),
         F.concat(F.lit("n"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(V))
                  .cast("string")).alias("dst"))
     .filter(F.col("src") != F.col("dst"))
     .localCheckpoint(eager=True))
n_edges = e.count()
t0 = time.perf_counter()
pr = pagerank(e, iterations=3, damping=0.85)
n_pr = pr.count()
kc = k_core(e, k=4)
n_kc = kc.count()
ts = triangle_stats(e)
n_ts = ts.count()
wall = time.perf_counter() - t0
print(json.dumps({{"cores": cores, "n_edges": n_edges, "n_nodes": n_pr,
                   "n_core": n_kc, "n_tri_nodes": n_ts,
                   "wall_sec": round(wall, 2),
                   "edges_per_sec": round(n_edges / wall, 1)}}))
"""


def _has_taskset() -> bool:
    from shutil import which

    return which("taskset") is not None


def _median(xs):
    ys = sorted(xs)
    n = len(ys)
    return ys[n // 2] if n % 2 else (ys[n // 2 - 1] + ys[n // 2]) / 2


def run_level(cores: int, edges: int, partitions: int) -> dict:
    code = _WORKER.format(repo=REPO, cores=cores, edges=edges, partitions=partitions)
    cmd = ["taskset", "-c", f"0-{cores - 1}"] if _has_taskset() else []
    out = subprocess.run(
        cmd + [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(f"level {cores} failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=3000000)
    ap.add_argument("--cores", default="2,8")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="scaling_r5_graph.json")
    args = ap.parse_args()
    small, big = (int(c) for c in args.cores.split(","))
    out_path = os.path.join(REPO, "BENCH", args.out)
    result = {
        "job": "graph_suite (pagerank3 + kcore4 + triangles)",
        "input": f"synthetic power-law digraph, {args.edges} edge rows",
        "cores": [small, big],
        "repeats": args.repeats,
        "rule": f"(median T{small} / median T{big}) / ({big}/{small})",
        "cells": [],
    }

    def flush():
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=2)

    for cores in (small, big):
        runs = [run_level(cores, args.edges, args.partitions) for _ in range(args.repeats)]
        walls = [r["wall_sec"] for r in runs]
        med = _median(walls)
        result["cells"].append({
            "cores": cores,
            "n_edges": runs[0]["n_edges"],
            "n_nodes": runs[0]["n_nodes"],
            "walls_sec": walls,
            "median_wall_sec": round(med, 2),
            "spread": round((max(walls) - min(walls)) / med, 3),
            "edges_per_sec_median": round(runs[0]["n_edges"] / med, 1),
        })
        flush()
    t_small = result["cells"][0]["median_wall_sec"]
    t_big = result["cells"][1]["median_wall_sec"]
    result["efficiency"] = round((t_small / t_big) / (big / small), 3)
    flush()
    print(json.dumps(result["cells"], indent=2))
    print("efficiency:", result["efficiency"])


if __name__ == "__main__":
    main()
