"""Round-5 additions II: triangle counting / clustering coefficient,
deterministic label propagation, sliding-window document chunking."""

import itertools
import math

import pytest
from pyspark.sql import functions as F

from trustfuse_spark.operators.curation import chunk_documents
from trustfuse_spark.operators.graph import (
    k_core,
    label_propagation,
    triangle_stats,
)


# ------------------------------------------------------------- triangles


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_triangle_counts_known_graph(spark):
    # K4 on a,b,c,d (4 triangles, every node in 3) plus a pendant e-a
    # (e has 0 triangles, a's lcc denominator grows) and noise: a dup
    # edge, a reversed edge, a self-loop — all must collapse.
    pairs = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"), ("e", "a"), ("b", "a"), ("a", "b"), ("c", "c"),
    ]
    got = {r["node"]: (r["triangles"], r["lcc"])
           for r in triangle_stats(_edges(spark, pairs)).collect()}
    assert got["e"] == (0, 0.0)
    # a: deg 4 (b,c,d,e), 3 triangles -> lcc 6/12
    assert got["a"] == (3, pytest.approx(0.5))
    for n in "bcd":
        assert got[n] == (3, pytest.approx(1.0))


def test_triangle_matches_bruteforce_random(spark):
    import random

    rng = random.Random(7)
    nodes = [f"v{i}" for i in range(30)]
    pairs = [
        (a, b) for a in nodes for b in nodes
        if a != b and rng.random() < 0.12
    ]
    got = {r["node"]: r["triangles"]
           for r in triangle_stats(_edges(spark, pairs)).collect()}
    # brute force over the undirected simple graph
    und = {frozenset(p) for p in pairs}
    adj = {n: set() for n in nodes}
    for e in und:
        a, b = sorted(e)
        adj[a].add(b)
        adj[b].add(a)
    for n in nodes:
        if not adj[n]:
            assert n not in got
            continue
        t = sum(
            1 for x, y in itertools.combinations(sorted(adj[n]), 2)
            if y in adj[x]
        )
        assert got[n] == t, n
        d = len(adj[n])
        # lcc consistency is covered by the closed-form identity


def test_lcc_degree_one_is_zero(spark):
    got = triangle_stats(_edges(spark, [("x", "y")])).collect()
    assert {r["node"]: r["lcc"] for r in got} == {"x": 0.0, "y": 0.0}


# ------------------------------------------------------- label propagation


def test_lpa_two_cliques_with_bridge(spark):
    # two triangles joined by one bridge edge: labels converge within each
    # clique; the deterministic max-label tie rule decides winners.
    pairs = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("x", "y"), ("y", "z"), ("x", "z"),
        ("c", "x"),
    ]
    out = {r["node"]: r["label"]
           for r in label_propagation(_edges(spark, pairs), iterations=4).collect()}
    # every clique ends with a single shared label
    assert len({out["a"], out["b"], out["c"]} | {out[n] for n in "abc"}) == 1
    assert len({out[n] for n in "xyz"}) == 1


def test_lpa_matches_manual_sync_iterations(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
    und = {frozenset(p) for p in pairs}
    adj = {}
    for e in und:
        a, b = sorted(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(2):
        new = {}
        for n in adj:
            cnt = {}
            for m in adj[n]:
                cnt[labels[m]] = cnt.get(labels[m], 0) + 1
            best = max(cnt.items(), key=lambda kv: (kv[1], kv[0]))
            new[n] = best[0]
        labels = new
    got = {r["node"]: r["label"]
           for r in label_propagation(_edges(spark, pairs), iterations=2).collect()}
    assert got == labels


def test_lpa_isolated_node_keeps_label(spark):
    # self-loop-only node is isolated in the simple graph
    pairs = [("a", "b"), ("q", "q")]
    got = {r["node"]: r["label"]
           for r in label_propagation(_edges(spark, pairs), iterations=3).collect()}
    assert got["q"] == "q"
    assert set(got) == {"a", "b", "q"}


# --------------------------------------------------------------- k-core


def test_kcore_cascading_peel(spark):
    # K4 clique (the 3-core) with a pendant CHAIN d-p1-p2-p3: each chain
    # node has degree <= 2, but they peel one per round from the far end
    # inward — a genuine multi-round cascade, which the gate's near-regular
    # 200-node universe never exercises (it fixpoints after one round).
    pairs = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"), ("d", "p1"), ("p1", "p2"), ("p2", "p3"),
    ]
    got = {r["node"]: r["core_deg"]
           for r in k_core(_edges(spark, pairs), k=3).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_kcore_matches_bruteforce_random(spark):
    import random

    rng = random.Random(11)
    nodes = [f"v{i}" for i in range(40)]
    pairs = [
        (a, b) for a in nodes for b in nodes
        if a != b and rng.random() < 0.10
    ]
    for k in (2, 3, 4):
        got = {r["node"]: r["core_deg"]
               for r in k_core(_edges(spark, pairs), k=k).collect()}
        # reference peel over the undirected simple graph
        und = {frozenset(p) for p in pairs}
        while True:
            deg = {}
            for e in und:
                for n in e:
                    deg[n] = deg.get(n, 0) + 1
            drop = {n for n, d in deg.items() if d < k}
            if not drop:
                break
            und = {e for e in und if not (e & drop)}
        deg = {}
        for e in und:
            for n in e:
                deg[n] = deg.get(n, 0) + 1
        assert got == deg, k


def test_kcore_empty_when_no_core(spark):
    # a tree has no 2-core
    pairs = [("a", "b"), ("b", "c"), ("b", "d"), ("d", "e")]
    assert k_core(_edges(spark, pairs), k=2).count() == 0


def test_kcore_noise_collapses(spark):
    # dup/reversed edges and self-loops must not inflate degrees
    pairs = [
        ("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("a", "c"),
        ("a", "a"), ("c", "c"),
    ]
    got = {r["node"]: r["core_deg"]
           for r in k_core(_edges(spark, pairs), k=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


# ------------------------------------------------------------ chunking


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _manual_chunks(text, max_len, stride):
    toks = [t for t in text.lower().split() if t]
    n = len(toks)
    if n == 0:
        return []
    nw = 1 if n <= max_len else -((n - max_len) // -stride) + 1
    out = []
    for i in range(nw):
        s = i * stride
        w = toks[s:s + max_len]
        out.append((i, s, len(w), " ".join(w)))
    return out


@pytest.mark.parametrize(
    "n_tok,max_len,stride",
    [(0, 4, 2), (1, 4, 2), (4, 4, 2), (5, 4, 2), (6, 4, 2),
     (9, 4, 4), (10, 3, 1), (7, 16, 16)],
)
def test_chunk_boundaries(spark, n_tok, max_len, stride):
    text = " ".join(f"t{i}" for i in range(n_tok))
    got = sorted(
        (r["chunk_idx"], r["start_tok"], r["n_tok"], r["chunk_text"])
        for r in chunk_documents(
            _docs(spark, [(1, text)]), max_len=max_len, stride=stride
        ).collect()
    )
    assert got == _manual_chunks(text, max_len, stride)


def test_chunk_overlap_covers_every_token(spark):
    text = " ".join(f"w{i}" for i in range(23))
    rows = chunk_documents(
        _docs(spark, [(7, text)]), max_len=8, stride=4
    ).collect()
    seen = set()
    for r in rows:
        seen.update(range(r["start_tok"], r["start_tok"] + r["n_tok"]))
    assert seen == set(range(23))
    # consecutive windows share exactly max_len - stride tokens
    rows.sort(key=lambda r: r["chunk_idx"])
    for a, b in zip(rows, rows[1:]):
        assert b["start_tok"] - a["start_tok"] == 4


def test_chunk_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), max_len=0)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), max_len=4, stride=0)


def test_link_prediction_matches_bruteforce_random(spark):
    """link_prediction == a Python brute-force Adamic-Adar over every
    non-adjacent pair, on a random 30-node graph."""
    import math
    import random

    from trustfuse_spark.operators.graph import link_prediction

    rng = random.Random(11)
    nodes = [f"v{i}" for i in range(30)]
    pairs = [
        (a, b) for a in nodes for b in nodes
        if a != b and rng.random() < 0.10
    ]
    und = {frozenset(p) for p in pairs}
    adj = {n: set() for n in nodes}
    for e in und:
        a, b = sorted(e)
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for a, b in itertools.combinations(sorted(nodes), 2):
        if frozenset((a, b)) in und:
            continue
        common = adj[a] & adj[b]
        if common:
            want[(a, b)] = (
                len(common),
                round(sum(1.0 / math.log(len(adj[w])) for w in common), 6),
            )
    got = {
        (r["node_a"], r["node_b"]): (r["common_neighbors"], r["adamic_adar"])
        for r in link_prediction(_edges(spark, pairs)).collect()
    }
    assert set(got) == set(want)
    for k, (cn, aa) in want.items():
        assert got[k][0] == cn, k
        assert abs(got[k][1] - aa) < 1e-6, k


def test_link_prediction_max_degree_shed(spark):
    """Apexes above max_degree are excluded from wedge enumeration: in a
    star + one side pair, capping below the hub degree removes every
    hub-mediated pair; leaf-mediated wedges survive."""
    from trustfuse_spark.operators.graph import link_prediction

    # hub h connects to l0..l4; l0-x and l1-x give x<->h wedges through
    # l0/l1 (degree 2 apexes)
    pairs = [("h", f"l{i}") for i in range(5)] + [("l0", "x"), ("l1", "x")]
    full = {
        (r["node_a"], r["node_b"]): r["common_neighbors"]
        for r in link_prediction(_edges(spark, pairs)).collect()
    }
    # hub-mediated only: l2/l3 share just h
    assert full[("l2", "l3")] == 1
    # l0/l1 share h AND x; x and h share l0 AND l1
    assert full[("l0", "l1")] == 2
    assert full[("h", "x")] == 2
    capped = {
        (r["node_a"], r["node_b"]): r["common_neighbors"]
        for r in link_prediction(_edges(spark, pairs), max_degree=4).collect()
    }
    # hub (deg 5) shed as apex: purely hub-mediated pairs gone
    assert ("l2", "l3") not in capped
    # wedges through deg-2 apexes survive
    assert capped[("h", "x")] == 2
    assert capped[("l0", "l1")] == 1
