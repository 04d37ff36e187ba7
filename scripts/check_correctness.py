"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, compares row count, column names, and an order-insensitive
value hash (values stringified with float canonicalization, rows sorted).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def frame_sig(cols: list[str], rows: list[tuple]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(",".join(canon(r[i]) for i in order) for r in rows)
    return sorted(cols), len(rows), hash(tuple(out)), out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from trustfuse_spark.session import get_spark

    spark = get_spark(app_name="correctness_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # Pair-exchange gates persist/read their id list only at sf0.01 (see
    # COVERAGE.md "pair-exchange gate contract"); comparing any other scale
    # against the committed sf0.01 ids would mismatch spuriously (ADVICE r3).
    gate_scale_only = {
        "minhash_neardup_docs", "embedding_neardup", "simhash_suite",
        # catd's chi2 closed form is pinned to the gate-scale dof window
        # (k <= 75 keeps chi2.cdf(0.025, k) ~ 1e-115 inside double range;
        # at sf0.1 the same slice reaches k where both the engine's and the
        # oracle's series underflow differently — documented in the query
        # docstring)
        "catd_engine_weights",
    }
    import os

    at_gate_scale = os.path.basename(sf_dir.rstrip("/")) == "sf0.01"
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in gate_scale_only and not at_gate_scale:
            print(f"{name:28s} SKIP (pair-exchange gate runs at sf0.01 only)")
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:28s} rows={len(srows):7d}  (rows-only check, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} ORACLE ERROR: {exc}")
            failures += 1
            continue
        sc, sn, sh, sv = frame_sig(scols, srows)
        oc, on, oh, ov = frame_sig(ocols, orows)
        ok = sc == oc and sn == on and sh == oh
        status = "OK " if ok else "FAIL"
        print(f"{name:28s} {status} rows={sn}/{on} cols={'=' if sc == oc else f'{sc} vs {oc}'}")
        if not ok:
            failures += 1
            sset, oset = set(sv), set(ov)
            for d in list(sset - oset)[:3]:
                print(f"    spark-only: {d}")
            for d in list(oset - sset)[:3]:
                print(f"    duck-only : {d}")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
