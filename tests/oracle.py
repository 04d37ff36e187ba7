"""Pure pandas/numpy mini-oracles for the fusion math (SURVEY §8).

Independent reimplementations of the model equations used to verify the
Spark dataflow. They operate on long-form claims
(bucket_id, source, entity, attr, value_str, value_num, claim_type) and
mirror the reference semantics exactly (tie-breaks pinned to ascending value,
matching the engine's documented choices).
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd

from trustfuse_spark.operators.fusion.truthfinder import jaro_py


def _facts(claims: pd.DataFrame):
    """-> dict[(bucket, entity, attr)] = list[(source, value, is_num)]."""
    facts = defaultdict(list)
    for row in claims.itertuples(index=False):
        is_num = row.value_num is not None and not pd.isna(row.value_num)
        v = float(row.value_num) if is_num else row.value_str
        facts[(row.bucket_id, row.entity, row.attr)].append((row.source, v, is_num))
    return facts


def _mode_min(values: list[str]) -> str:
    counts = pd.Series(values).value_counts()
    top = counts[counts == counts.max()].index
    return sorted(top)[0]


def majority_oracle(claims: pd.DataFrame) -> dict:
    """fact -> truth value (mode w/ lexicographic tie; median snapped to the
    nearest claimed value, ties to the smaller)."""
    out = {}
    for key, rows in _facts(claims).items():
        vals = [v for _, v, _ in rows]
        if rows[0][2]:
            med = float(np.median(vals))
            out[key] = min(sorted(set(vals)), key=lambda v: (abs(v - med), v))
        else:
            out[key] = _mode_min(vals)
    return out


def crh_oracle(claims: pd.DataFrame, max_itr: int = 10, eps: float = 0.1):
    """-> (truth: fact->value, weights: (bucket, source)->w)."""
    facts = _facts(claims)
    buckets = sorted({k[0] for k in facts})
    truth, weights = {}, {}
    for b in buckets:
        bfacts = {k: v for k, v in facts.items() if k[0] == b}
        sources = sorted({s for rows in bfacts.values() for s, _, _ in rows})
        t = {}
        denom = {}
        for key, rows in bfacts.items():
            vals = [v for _, v, _ in rows]
            if rows[0][2]:
                t[key] = float(np.median(vals))
                denom[key] = max(float(np.std(vals)), eps)
            else:
                t[key] = _mode_min(vals)
        w = {s: 0.0 for s in sources}
        for _ in range(max_itr):
            raw = {s: 0.0 for s in sources}
            for key, rows in bfacts.items():
                for s, v, is_num in rows:
                    if is_num:
                        raw[s] += (v - t[key]) ** 2 / denom[key]
                    else:
                        raw[s] += float(v != t[key])
            tot = sum(raw.values())
            w = {
                s: (-math.log(raw[s] / tot) if raw[s] > 0 else 0.0)
                for s in sources
            }
            for key, rows in bfacts.items():
                if rows[0][2]:
                    cands = sorted({v for _, v, _ in rows})
                    losses = {
                        c: sum(w[s] * (c - v) ** 2 / denom[key] for s, v, _ in rows)
                        for c in cands
                    }
                    t[key] = min(cands, key=lambda c: (losses[c], c))
                else:
                    cands = sorted({v for _, v, _ in rows})
                    scores = {
                        c: sum(w[s] for s, v, _ in rows if v == c) for c in cands
                    }
                    # max score; tie -> lexicographically smallest value
                    # (max() keeps the first maximum of the sorted candidates)
                    t[key] = max(cands, key=lambda c: scores[c])
        truth.update({k: v for k, v in t.items()})
        weights.update({(b, s): w[s] for s in sources})
    return truth, weights


def truthfinder_oracle(
    claims: pd.DataFrame,
    max_itr: int = 10,
    rho: float = 0.5,
    gamma: float = 0.3,
    theta: float = 0.0,
):
    facts = _facts(claims)
    # claim_type per fact for branch selection
    ctypes = {}
    for row in claims.itertuples(index=False):
        ctypes[(row.bucket_id, row.entity, row.attr)] = row.claim_type
    buckets = sorted({k[0] for k in facts})
    truth, weights = {}, {}
    for b in buckets:
        bfacts = {k: v for k, v in facts.items() if k[0] == b}
        sources = sorted({s for rows in bfacts.values() for s, _, _ in rows})
        tau = {s: -math.log(1 - 0.9) for s in sources}
        s_scores = {}
        for _ in range(max_itr):
            s_scores = {}
            for key, rows in bfacts.items():
                cands = sorted({v for _, v, _ in rows})
                sigma = {
                    c: sum(tau[s] for s, v, _ in rows if v == c) for c in cands
                }
                tmp = {}
                ct = ctypes[key]
                for c in cands:
                    if ct in ("string", "entity"):
                        loss = sum(
                            sigma[u] * (math.exp(-jaro_py(str(c), str(u))) - theta)
                            for u in cands
                            if u != c
                        )
                        tmp[c] = (1 - rho * (1 - theta)) * sigma[c] + rho * loss
                    elif ct == "quantity":
                        loss = sum(
                            sigma[u] * (math.exp(-abs(u - c)) - theta) for u in cands
                        )
                        tmp[c] = (1 - rho * (1 - theta)) * sigma[c] + rho * loss
                    else:
                        tmp[c] = sigma[c]
                s_scores[key] = {
                    c: 1.0 / (1.0 + math.exp(-gamma * tmp[c])) for c in cands
                }
            tsum = {s: [0.0, 0] for s in sources}
            for key, rows in bfacts.items():
                for s, v, _ in rows:
                    tsum[s][0] += s_scores[key][v]
                    tsum[s][1] += 1
            for s in sources:
                tv = tsum[s][0] / tsum[s][1] if tsum[s][1] else 0.0
                tau[s] = math.log(1e10) if tv >= 1 else -math.log(1 - tv)
        for key, rows in bfacts.items():
            sc = s_scores[key]
            truth[key] = max(sorted(sc), key=lambda c: (sc[c],))
            # ties: sorted() puts smaller first; max keeps FIRST max -> min value
        weights.update({(b, s): tau[s] for s in sources})
    return truth, weights
