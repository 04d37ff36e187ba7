"""Weak-scaling extension for the curation pipeline: one more doubling
(E=768k -> ~57M docs) at 8 pinned cores, mirroring the KG pipeline's
71M-doc cell (scaling_r4_960k.json). Reuses the pinned fresh-JVM worker
from bench_scaling_curation (taskset + ActiveProcessorCount); export
SPARK_DRIVER_MEM=80g before running (the worker's setdefault respects it).

Usage: SPARK_DRIVER_MEM=80g python scripts/extend_curation_768k.py [repeats]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.bench_scaling_curation import _median, run_level  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "scaling_r5_curation_768k.json")
E = 768_000
CORES = 8


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    walls, runs = [], []
    for _ in range(repeats):
        r = run_level(CORES, E, 64)
        runs.append(r)
        walls.append(r["wall_sec"])
        med = _median(walls)
        result = {
            "job": "curation_pipeline (dedup->quality->decontaminate->sample->pack)",
            "input": "synthetic interleaved docs, S=20, R=4 (text derived)",
            "cores": CORES,
            "entities": E,
            "repeats": len(walls),
            "walls_sec": walls,
            "note": ("weak-scaling extension one doubling past r4's 28.5M-doc "
                     "high (VERDICT r4 item 7); pinned taskset+"
                     "ActiveProcessorCount, fresh JVM per run"),
            "n_docs": r["n_docs"],
            "n_packed": r["n_packed"],
            "median_wall_sec": round(med, 2),
            "spread": round((max(walls) - min(walls)) / med, 3),
            "docs_per_sec_median": round(r["n_docs"] / med, 1),
        }
        with open(OUT, "w") as fh:  # flush per run: interruptions keep progress
            json.dump(result, fh, indent=1)
        print(json.dumps({"wall": r["wall_sec"], "n_docs": r["n_docs"],
                          "docs_per_sec_median": result["docs_per_sec_median"]}))
    print(f"-> {OUT}")


if __name__ == "__main__":
    main()
