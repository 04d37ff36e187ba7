"""WikiConflict pickle loader — reads the reference's on-disk format
directly (docs/installation.md structure; DynamicDataset, dataset.py:337-395):

    {bid: {"data": {"value": wide_df, "qid": wide_df},
           "GT":   {"value": wide_df(list cells), "qid": ...,
                    "value_order": {attr: [[...],[...]]}, "qid_order": ...}}}

Outputs the engine's long tables:
    claims(bucket_id, source, entity, attr, value_str, value_qid)
    gt(bucket_id, entity, attr, gt_values array<string>)
    partial_orders(attr, value, depth, coeff, leaf)

Cumulative-union semantics (bucket i ⊇ bucket i-1 for dynamic datasets,
dataset.py:362-379) are NOT materialized here — apply
operators.bucketize.cumulative_bucket at query time.

Driver-side pandas is only the pickle decode (the reference's own format is
a pickled dict of small DataFrames); everything downstream is Spark.
"""

from __future__ import annotations

import pickle

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CLAIMS_SCHEMA = (
    "bucket_id int, source string, entity string, attr string,"
    " value_str string, value_qid string"
)
GT_SCHEMA = "bucket_id int, entity string, attr string, gt_values array<string>"
PO_SCHEMA = "attr string, value string, depth int, coeff double, leaf boolean"


def _cell_values(v) -> list[str]:
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return []
    if isinstance(v, (list, set)):
        return [str(x) for x in v if x is not None]
    if isinstance(v, tuple):
        return [str(v)]
    return [str(v)]


def _wide_rows(bid: int, vdf: pd.DataFrame, qdf: pd.DataFrame | None, entity_col: str):
    attrs = [c for c in vdf.columns if c not in (entity_col, "Source")]
    for i in range(len(vdf)):
        row = vdf.iloc[i]
        qrow = qdf.iloc[i] if qdf is not None and i < len(qdf) else None
        for attr in attrs:
            vals = _cell_values(row[attr])
            qvals = _cell_values(qrow[attr]) if qrow is not None and attr in qrow else []
            for j, val in enumerate(vals):
                yield (
                    bid,
                    str(row.get("Source", "")),
                    str(row[entity_col]),
                    attr,
                    val,
                    qvals[j] if j < len(qvals) else None,
                )


def load_wikiconflict(
    spark: SparkSession, path: str, entity_col: str = "Entity"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """-> (claims, gt, partial_orders) Spark DataFrames."""
    with open(path, "rb") as fh:
        buckets = pickle.load(fh)

    claim_rows: list[tuple] = []
    gt_rows: list[tuple] = []
    po: dict[tuple[str, str], tuple[int, int]] = {}  # (attr, value) -> (depth, max_depth)
    for bid in sorted(buckets):
        b = buckets[bid]
        vdf = b["data"]["value"]
        qdf = b["data"].get("qid")
        claim_rows.extend(_wide_rows(int(bid), vdf, qdf, entity_col))
        gtd = b.get("GT", {})
        gvdf = gtd.get("value")
        if gvdf is not None:
            for i in range(len(gvdf)):
                row = gvdf.iloc[i]
                ent = str(row[entity_col]) if entity_col in gvdf.columns else None
                for attr in gvdf.columns:
                    if attr in (entity_col, "Source"):
                        continue
                    vals = _cell_values(row[attr])
                    if vals and ent is not None:
                        gt_rows.append((int(bid), ent, attr, vals))
        # partial orders: {attr: [chain][level][value]} — a LIST of chains,
        # each chain a list of levels from least to most specific
        # (create_partial_order_graphs, dataset.py:397-434: per chain
        # max_depth = len(chain)-1, coeff = depth/max_depth, leaf only on
        # the deepest level). max(...,1) guards the single-level chain the
        # reference would crash on with 0/0.
        for attr, chains in (gtd.get("value_order") or {}).items():
            for chain in chains or []:
                if not chain:
                    continue
                max_depth = max(len(chain) - 1, 1)
                deepest = len(chain) - 1
                for depth, level in enumerate(chain):
                    for val in level or []:
                        if val is not None:
                            po[(attr, str(val))] = (
                                depth,
                                max_depth,
                                depth == deepest and depth > 0,
                            )

    claims = spark.createDataFrame(claim_rows, CLAIMS_SCHEMA)
    gt = spark.createDataFrame(gt_rows, GT_SCHEMA) if gt_rows else spark.createDataFrame([], GT_SCHEMA)
    po_rows = [
        (attr, val, depth, depth / max_depth, leaf)
        for (attr, val), (depth, max_depth, leaf) in po.items()
    ]
    partial_orders = (
        spark.createDataFrame(po_rows, PO_SCHEMA)
        if po_rows
        else spark.createDataFrame([], PO_SCHEMA)
    )
    return claims, gt, partial_orders
