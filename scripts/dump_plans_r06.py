"""Dump .explain('formatted') for the round-6 evidence files.

Usage: python scripts/dump_plans_r06.py <repo_root> <out_dir> <suffix> [q ...]
Writes <out_dir>/<query>_<suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys

repo, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
queries = sys.argv[4:]
sys.path.insert(0, repo)

from trustfuse_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="dump_plans")
import __spark_entry__ as entrymod  # noqa: E402

os.makedirs(out_dir, exist_ok=True)
qs = entrymod.queries()
for name in queries:
    df = qs[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print(name, "ok", flush=True)
