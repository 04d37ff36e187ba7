"""Scaling evidence for the OPTIONAL near-dup stage of corpus curation:
MinHash-LSH candidate pairs -> exact-Jaccard verify -> connected components
-> drop list (dedup.near_duplicates_minhash + neardup_drop_ids).

The default curate_corpus chain excludes near-dup by design (it is the most
expensive optional stage); this harness prices it separately so the chain's
published docs/s numbers can be composed with a measured near-dup cost
(VERDICT r4 item 4). The stage is priced in its chain position — AFTER
exact dedup, which curate_corpus always runs first: gen_docs' ~74
near-identical revision copies per entity otherwise explode LSH candidate
pairs combinatorially (measured: a 2-core run at E=96k did not finish in
80 minutes raw, vs ~29k sane pairs post-dedup at E=24k). Protocol matches bench_scaling_curation.py: same job,
two pinned parallelism levels (taskset + ActiveProcessorCount, fresh JVM),
median of N repeats, efficiency = (T_small / T_big) / (cores_big /
cores_small). --cores with one level (e.g. "8,8") prices a throughput-only
cell at bigger inputs.

Usage: python scripts/bench_scaling_neardup.py [--entities 24000]
       [--cores 2,8] [--repeats 3] [--out scaling_r5_neardup.json]
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
from trustfuse_spark.operators.dedup import (
    exact_duplicates, near_duplicates_minhash, neardup_drop_ids)

cores = {cores}
spark = get_spark(app_name=f"neardup_scaling_{{cores}}",
                  master=f"local[{{cores}}]", shuffle_partitions={partitions},
                  extra_conf={{"spark.driver.extraJavaOptions":
                               f"-XX:ActiveProcessorCount={{cores}}"}})
spark.range(1000).count()
docs = gen_docs(spark, n_entities={entities}, n_sources=20, n_revs=4,
                num_partitions={partitions})
corpus = docs.select(
    "doc_id",
    F.concat_ws(" ", F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"] == "text"),
        lambda s: s["text"])).alias("text"),
).localCheckpoint(eager=True)
n_docs = corpus.count()
# Price the stage in its chain position: curate_corpus runs exact dedup
# FIRST, so the optional LSH pass only ever sees exact-dedup survivors.
# On the raw gen_docs corpus the ~74 near-identical revision copies per
# entity make LSH candidate pairs explode combinatorially (C(74,2) per
# entity) — a corpus no sane pipeline would hand to MinHash.
keep = exact_duplicates(corpus, "doc_id", "text").select(
    F.col("rep_id").alias("doc_id"))
reps = corpus.join(keep, "doc_id", "left_semi").localCheckpoint(eager=True)
n_reps = reps.count()
t0 = time.perf_counter()
pairs = near_duplicates_minhash(reps, "doc_id", "text", threshold=0.8)
drops = neardup_drop_ids(pairs)
n_drop = drops.count()
wall = time.perf_counter() - t0
print(json.dumps({{"cores": cores, "n_docs": n_reps, "n_corpus": n_docs,
                   "n_drop": n_drop, "wall_sec": round(wall, 2),
                   "docs_per_sec": round(n_reps / wall, 1)}}))
"""


def _has_taskset() -> bool:
    from shutil import which

    return which("taskset") is not None


def run_level(cores: int, entities: int, partitions: int) -> dict:
    code = _WORKER.format(repo=REPO, cores=cores, entities=entities,
                          partitions=partitions)
    cmd = ["taskset", "-c", f"0-{cores - 1}"] if _has_taskset() else []
    out = subprocess.run(cmd + [sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=7200, cwd=REPO)
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
    ap.add_argument("--out", default="scaling_r5_neardup.json")
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
            "n_corpus": runs[0]["n_corpus"],
            "n_drop": runs[0]["n_drop"], "walls_sec": walls,
            "median_wall_sec": round(med, 2),
            "spread": round((max(walls) - min(walls)) / med, 3),
            "docs_per_sec_median": round(runs[0]["n_docs"] / med, 1),
        })
        print(json.dumps(cells[-1]))

    t_small, t_big = cells[0]["median_wall_sec"], cells[1]["median_wall_sec"]
    eff = (t_small / t_big) / (big / small)
    result = {
        "job": "neardup_minhash (LSH pairs -> exact verify -> CC -> drop list)",
        "input": ("synthetic interleaved docs, S=20, R=4 (text derived), "
                  "AFTER exact dedup — the stage's position in curate_corpus; "
                  "n_docs = stage input (exact-dedup survivors), n_corpus = "
                  "raw docs"),
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
