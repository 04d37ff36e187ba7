"""Scaling-efficiency evidence (BASELINE.json north_rule).

Runs the SAME KG pipeline job (synthesized interleaved docs -> extraction ->
CRH fusion -> triples) at two parallelism levels (default local[8] vs
local[32]) on the SAME deterministic input, reports docs/sec at both and
efficiency = (T_small / T_big) / (cores_big / cores_small).

Each level runs in a fresh subprocess (a JVM can't change master); results
land in BENCH/scaling.json and are summarized into BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [--entities 12000] [--cores 8,32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Both levels run the SAME partitioning (shuffle partitions, input layout)
# so the only variable is executor-thread count — the local-mode analogue of
# growing a cluster from N to 4N executors with a fixed data layout.
#
# Honesty fix (round 2): local[N] alone limits only TASK threads; the JVM's
# parallel-GC / netty / compression helper threads still use all 32 host
# CPUs, so the "2-core" run used to get ~23 free GC threads a real 2-core
# executor host would never have — deflating measured speedup. Each level is
# therefore pinned to exactly N CPUs (taskset) and the JVM is told so
# (ActiveProcessorCount), emulating an N-core executor host.
_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
from trustfuse_spark.session import get_spark
from trustfuse_spark.datagen import gen_docs
from trustfuse_spark.plans.pipeline import run_pipeline

cores = {cores}
spark = get_spark(app_name=f"scaling_{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions={partitions},
                  extra_conf={{"spark.driver.extraJavaOptions":
                               f"-XX:ActiveProcessorCount={{cores}}"}})
spark.range(1000).count()  # JVM warm
docs = gen_docs(spark, n_entities={entities}, n_sources=20, n_revs=4,
                num_partitions={partitions}).localCheckpoint(eager=True)
n_docs = docs.count()
t0 = time.perf_counter()
triples, _ = run_pipeline(docs, model="crh", max_itr=3)
n_triples = triples.count()
wall = time.perf_counter() - t0
print(json.dumps({{"cores": cores, "n_docs": n_docs, "n_triples": n_triples,
                   "wall_sec": round(wall, 2),
                   "docs_per_sec": round(n_docs / wall, 1)}}))
"""


def run_level(cores: int, entities: int, partitions: int) -> dict:
    code = _WORKER.format(repo=REPO, cores=cores, entities=entities, partitions=partitions)
    # Pin the whole process tree (python driver + JVM) to exactly N CPUs.
    cmd = ["taskset", "-c", f"0-{cores - 1}"] if _has_taskset() else []
    out = subprocess.run(
        cmd + [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(f"level {cores} failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def _has_taskset() -> bool:
    from shutil import which

    return which("taskset") is not None


def _median(xs: list[float]) -> float:
    ys = sorted(xs)
    n = len(ys)
    return ys[n // 2] if n % 2 else (ys[n // 2 - 1] + ys[n // 2]) / 2


def run_cell(cores: int, entities: int, partitions: int, repeats: int) -> dict:
    """One (cores, entities) cell: `repeats` fresh-JVM runs, median wall.

    Single runs showed +-40% wall variance on this VM (VERDICT r1 item 8:
    'single-run measurements ... are not evidence'); the median over >=3
    repeats is the reported point, with every raw wall kept for audit.
    """
    runs = [run_level(cores, entities, partitions) for _ in range(repeats)]
    walls = [r["wall_sec"] for r in runs]
    med = _median(walls)
    return {
        "cores": cores,
        "entities": entities,
        "n_docs": runs[0]["n_docs"],
        "walls_sec": walls,
        "median_wall_sec": round(med, 2),
        "spread": round((max(walls) - min(walls)) / med, 3),
        "docs_per_sec_median": round(runs[0]["n_docs"] / med, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", default="120000")
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="scaling.json")
    args = ap.parse_args()
    small, big = (int(c) for c in args.cores.split(","))
    ent_points = [int(e) for e in str(args.entities).split(",")]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(REPO, "BENCH", args.out)
    result = {
        "job": "kg_pipeline_crh3",
        "input": "synthetic interleaved docs, S=20, R=4",
        "cores": [small, big],
        "repeats": args.repeats,
        "rule": f"(median T{small} / median T{big}) / ({big}/{small})",
        "cells": [],
    }

    def flush() -> None:
        # rewrite after every cell: a killed run keeps every finished cell
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=2)

    flush()
    for entities in ent_points:
        c_small = run_cell(small, entities, args.partitions, args.repeats)
        c_big = run_cell(big, entities, args.partitions, args.repeats)
        speedup = c_small["median_wall_sec"] / c_big["median_wall_sec"]
        result["cells"].append(
            {
                "entities": entities,
                "small": c_small,
                "big": c_big,
                "speedup": round(speedup, 3),
                "scaling_efficiency": round(speedup / (big / small), 3),
            }
        )
        flush()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
