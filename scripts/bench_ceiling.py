"""Machine scaling ceiling, variance-controlled (3 fresh-JVM repeats/cell).

Two microbenchmarks that bracket any Spark job on this VM:
  compute — whole-stage-codegen hash aggregation over range(), no shuffle:
            the best case any plan can reach.
  shuffle — 200M-row / 10M-key groupBy: the bandwidth-bound worst case.

Reported per (kind, cores): median wall + raw walls; efficiency between the
two core counts. The pipeline's own efficiency is judged against these
brackets in BENCH/BASELINE.md.

Usage: python scripts/bench_ceiling.py [--cores 2,8] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from trustfuse_spark.session import get_spark
spark = get_spark(app_name="ceiling_{kind}_{cores}", master="local[{cores}]",
                  shuffle_partitions=64)
spark.range(1000).count()
t0 = time.perf_counter()
if "{kind}" == "compute":
    spark.range(4_000_000_000, numPartitions=64).selectExpr(
        "bit_xor(xxhash64(id)) as h").collect()  # ANSI: sum would overflow
else:
    spark.range(200_000_000, numPartitions=64).selectExpr(
        "id % 10000000 as k").groupBy("k").count().selectExpr(
        "sum(count) as n").collect()
print(json.dumps({{"wall_sec": round(time.perf_counter() - t0, 2)}}))
"""


def run(kind: str, cores: int) -> float:
    code = _WORKER.format(repo=REPO, kind=kind, cores=cores)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=900, cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])["wall_sec"]


def median(xs):
    ys = sorted(xs)
    return ys[len(ys) // 2] if len(ys) % 2 else (ys[len(ys) // 2 - 1] + ys[len(ys) // 2]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", default="2,8")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    small, big = (int(c) for c in args.cores.split(","))

    result = {"cores": [small, big], "repeats": args.repeats, "kinds": {}}
    for kind in ("compute", "shuffle"):
        walls = {c: [run(kind, c) for _ in range(args.repeats)] for c in (small, big)}
        med_s, med_b = median(walls[small]), median(walls[big])
        result["kinds"][kind] = {
            "walls": {str(c): w for c, w in walls.items()},
            "median": {str(small): med_s, str(big): med_b},
            "speedup": round(med_s / med_b, 3),
            "efficiency": round((med_s / med_b) / (big / small), 3),
        }
        with open(os.path.join(REPO, "BENCH", "ceiling.json"), "w") as fh:
            json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
