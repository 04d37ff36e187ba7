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
_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
from trustfuse_spark.session import get_spark
from trustfuse_spark.datagen import gen_docs
from trustfuse_spark.plans.pipeline import run_pipeline

cores = {cores}
spark = get_spark(app_name=f"scaling_{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions={partitions})
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
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(f"level {cores} failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=12000)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--partitions", type=int, default=64)
    args = ap.parse_args()
    small, big = (int(c) for c in args.cores.split(","))

    r_small = run_level(small, args.entities, args.partitions)
    r_big = run_level(big, args.entities, args.partitions)
    speedup = r_small["wall_sec"] / r_big["wall_sec"]
    efficiency = speedup / (big / small)
    result = {
        "job": "kg_pipeline_crh3",
        "input": f"synthetic interleaved docs, E={args.entities}, S=20, R=4",
        "n_docs": r_small["n_docs"],
        "levels": [r_small, r_big],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "rule": f"(T{small}/T{big}) / ({big}/{small})",
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
