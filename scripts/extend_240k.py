"""Add repeats to the E=240k cell of BENCH/scaling_final.json (median of 5).

Runs 2 more fresh-JVM pinned runs per core level and merges the walls into
the existing cell; flushes after every run so an interrupted pass keeps
whatever finished.

Usage: python scripts/extend_240k.py [extra_repeats_per_level]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.bench_scaling import _median, run_level  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "BENCH", "scaling_final.json")
E = 240_000


def recompute(cell: dict) -> None:
    for side in ("small", "big"):
        walls = cell[side]["walls_sec"]
        med = _median(walls)
        cell[side]["median_wall_sec"] = round(med, 2)
        cell[side]["spread"] = round((max(walls) - min(walls)) / med, 3)
        cell[side]["docs_per_sec_median"] = round(cell[side]["n_docs"] / med, 1)
    speedup = cell["small"]["median_wall_sec"] / cell["big"]["median_wall_sec"]
    ratio = cell["big"]["cores"] / cell["small"]["cores"]
    cell["speedup"] = round(speedup, 3)
    cell["scaling_efficiency"] = round(speedup / ratio, 3)


def main() -> None:
    extra = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    with open(PATH) as fh:
        result = json.load(fh)
    (cell,) = [c for c in result["cells"] if c["entities"] == E]
    for side, cores in (("small", 2), ("big", 8)):
        for _ in range(extra):
            r = run_level(cores, E, 64)
            cell[side]["walls_sec"].append(r["wall_sec"])
            recompute(cell)
            result["repeats"] = "3 (120k) / 5 (240k)"
            with open(PATH, "w") as fh:
                json.dump(result, fh, indent=2)
            print(json.dumps({"cores": cores, "wall": r["wall_sec"],
                              "eff_now": cell["scaling_efficiency"]}))


if __name__ == "__main__":
    main()
