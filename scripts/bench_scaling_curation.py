"""Scaling evidence for the corpus-curation pipeline (plans/curate.py).

Same protocol as bench_scaling.py (the north-rule harness): the SAME job —
exact dedup -> quality filter -> benchmark decontamination -> hash sample ->
sequence packing over a deterministic gen_docs corpus — at two pinned
parallelism levels (taskset + ActiveProcessorCount, fresh JVM per run,
median of N repeats), reporting docs/sec at both and
efficiency = (T_small / T_big) / (cores_big / cores_small).

Usage: python scripts/bench_scaling_curation.py [--entities 24000]
       [--cores 2,8] [--repeats 3]
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
from trustfuse_spark.datagen import gen_docs
from trustfuse_spark.plans.curate import curate_corpus

cores = {cores}
spark = get_spark(app_name=f"curation_scaling_{{cores}}",
                  master=f"local[{{cores}}]", shuffle_partitions={partitions},
                  extra_conf={{"spark.driver.extraJavaOptions":
                               f"-XX:ActiveProcessorCount={{cores}}"}})
spark.range(1000).count()
docs = gen_docs(spark, n_entities={entities}, n_sources=20, n_revs=4,
                num_partitions={partitions})
corpus = docs.select(
    "doc_id",
    F.substring("doc_id", 9, 4).alias("source"),
    F.concat_ws(" ", F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"] == "text"),
        lambda s: s["text"])).alias("text"),
).localCheckpoint(eager=True)
n_docs = corpus.count()
toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
bench_grams = corpus.filter(F.pmod(F.xxhash64("doc_id"), F.lit(211)) == 0).select(
    F.concat_ws(" ", F.slice(toks, 1, 8)).alias("gram"))
draw = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(1)), F.lit(1000000)) / 1000000.0
t0 = time.perf_counter()
packed = curate_corpus(corpus, benchmark=bench_grams, min_quality=0.2,
                       default_rate=0.9, sample_hash=draw, capacity=2048)
n_packed = packed.count()
wall = time.perf_counter() - t0
print(json.dumps({{"cores": cores, "n_docs": n_docs, "n_packed": n_packed,
                   "wall_sec": round(wall, 2),
                   "docs_per_sec": round(n_docs / wall, 1)}}))
"""


def _has_taskset() -> bool:
    from shutil import which

    return which("taskset") is not None


def run_level(cores: int, entities: int, partitions: int) -> dict:
    code = _WORKER.format(repo=REPO, cores=cores, entities=entities,
                          partitions=partitions)
    cmd = ["taskset", "-c", f"0-{cores - 1}"] if _has_taskset() else []
    out = subprocess.run(cmd + [sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=3600, cwd=REPO)
    if out.returncode != 0:
        raise RuntimeError(f"level {cores} failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def _median(xs: list[float]) -> float:
    ys = sorted(xs)
    n = len(ys)
    return ys[n // 2] if n % 2 else (ys[n // 2 - 1] + ys[n // 2]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=24000)
    ap.add_argument("--cores", default="2,8")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="scaling_r4_curation.json")
    args = ap.parse_args()
    small, big = (int(c) for c in args.cores.split(","))

    cells = []
    for cores in (small, big):
        runs = [run_level(cores, args.entities, args.partitions)
                for _ in range(args.repeats)]
        walls = [r["wall_sec"] for r in runs]
        med = _median(walls)
        cells.append({
            "cores": cores, "n_docs": runs[0]["n_docs"],
            "n_packed": runs[0]["n_packed"], "walls_sec": walls,
            "median_wall_sec": round(med, 2),
            "spread": round((max(walls) - min(walls)) / med, 3),
            "docs_per_sec_median": round(runs[0]["n_docs"] / med, 1),
        })
        print(json.dumps(cells[-1]))

    t_small, t_big = cells[0]["median_wall_sec"], cells[1]["median_wall_sec"]
    eff = (t_small / t_big) / (big / small)
    result = {
        "job": "curation_pipeline (dedup->quality->decontaminate->sample->pack)",
        "input": "synthetic interleaved docs, S=20, R=4 (text derived)",
        "cores": [small, big], "repeats": args.repeats,
        "rule": f"(median T{small} / median T{big}) / ({big}/{small})",
        "cells": cells, "efficiency": round(eff, 3),
    }
    out_path = os.path.join(REPO, "BENCH", args.out)
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"efficiency {eff:.3f} -> {out_path}")


if __name__ == "__main__":
    main()
