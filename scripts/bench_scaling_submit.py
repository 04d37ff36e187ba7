"""Scaling evidence via the literal north_rule launch path: spark-submit
--py-files at two parallelism levels.

The pinned matrices (bench_scaling.py) measure the same job through an
in-process SparkSession; the north rule names `spark-submit --py-files` as
the launch vehicle, so this runner evidences THAT path end-to-end:

  1. zips the package (shutil.make_archive -> /tmp/trustfuse_spark.zip);
  2. for each core count N: `taskset -c 0..N-1 spark-submit
     --master local[N] --py-files <zip> scripts/submit_job.py ...`,
     run from /tmp so the zip is the only route to the package (the JSON
     line's `pkg` field is asserted to point inside the zip);
  3. same input, same shuffle partitions at both levels; JVM told its core
     budget via -XX:ActiveProcessorCount (same honesty fix as
     bench_scaling.py — local[N] alone leaves GC/netty threads unpinned);
  4. median-of-repeats walls; efficiency = (T_small/T_big)/(big/small).

Usage: python scripts/bench_scaling_submit.py [--entities 240000]
           [--cores 2,8] [--repeats 3] [--out scaling_r5_submit.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def make_zip() -> str:
    return shutil.make_archive("/tmp/trustfuse_spark", "zip", REPO, "trustfuse_spark")


def run_level(zip_path: str, cores: int, entities: int, partitions: int) -> dict:
    mem = os.environ.get("SPARK_DRIVER_MEM", "48g")
    cmd = []
    if shutil.which("taskset"):
        cmd += ["taskset", "-c", f"0-{cores - 1}"]
    cmd += [
        SPARK_SUBMIT,
        "--master", f"local[{cores}]",
        "--driver-memory", mem,
        "--conf", f"spark.driver.extraJavaOptions=-XX:ActiveProcessorCount={cores}",
        "--conf", "spark.local.dir=/dev/shm/spark-local",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "submit_job.py"),
        "--entities", str(entities),
        "--partitions", str(partitions),
        "--model", "crh",
        "--max-itr", "3",
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600,
        cwd="/tmp",  # NOT the repo: the zip must be the only package source
        env={**os.environ, "PYTHONPATH": ""},
    )
    if out.returncode != 0:
        raise RuntimeError(f"level {cores} failed:\n{out.stderr[-3000:]}")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    if "trustfuse_spark.zip" not in rec["pkg"]:
        raise RuntimeError(f"package not loaded from the --py-files zip: {rec['pkg']}")
    return rec


def _median(xs: list[float]) -> float:
    ys = sorted(xs)
    n = len(ys)
    return ys[n // 2] if n % 2 else (ys[n // 2 - 1] + ys[n // 2]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=240000)
    ap.add_argument("--cores", default="2,8")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="scaling_r5_submit.json")
    args = ap.parse_args()
    small, big = (int(c) for c in args.cores.split(","))

    zip_path = make_zip()
    print(f"zip: {zip_path}")
    cells = {}
    for cores in (small, big):
        runs = [
            run_level(zip_path, cores, args.entities, args.partitions)
            for _ in range(args.repeats)
        ]
        walls = [r["wall_sec"] for r in runs]
        med = _median(walls)
        cells[cores] = {
            "cores": cores,
            "entities": args.entities,
            "n_docs": runs[0]["n_docs"],
            "walls_sec": walls,
            "median_wall_sec": round(med, 2),
            "spread": round((max(walls) - min(walls)) / med, 3),
            "docs_per_sec_median": round(runs[0]["n_docs"] / med, 1),
            "pkg": runs[0]["pkg"],
        }
        print(json.dumps(cells[cores]))

    eff = (cells[small]["median_wall_sec"] / cells[big]["median_wall_sec"]) / (big / small)
    result = {
        "launch": "spark-submit --py-files (zip-only package source, cwd=/tmp)",
        "cells": list(cells.values()),
        "efficiency": round(eff, 3),
        "cores": [small, big],
    }
    out_path = os.path.join(REPO, "BENCH", args.out)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"efficiency": result["efficiency"], "out": out_path}))


if __name__ == "__main__":
    main()
