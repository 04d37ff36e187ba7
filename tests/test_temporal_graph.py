"""Round-5 additions: as-of join / point-in-time snapshot, PageRank,
Gopher quality rules, N-Triples serialization."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from trustfuse_spark.operators.curation import gopher_rules
from trustfuse_spark.operators.graph import pagerank
from trustfuse_spark.operators.kg import to_ntriples
from trustfuse_spark.operators.temporal import asof_join, snapshot_asof


def _ts(s):
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- as-of join


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:10:00"), "a"),
            (1, _ts("2024-01-01T01:00:00"), "b"),
            (1, _ts("2024-01-01T02:30:00"), "c"),
            (2, _ts("2024-01-01T00:05:00"), "d"),  # before any right row
            (3, _ts("2024-01-01T09:00:00"), "e"),  # key with no right rows
        ],
        "uid long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), 10.0),
            (1, _ts("2024-01-01T01:00:00"), 20.0),  # equal-ts: inclusive
            (1, _ts("2024-01-01T02:00:00"), 30.0),
            (2, _ts("2024-01-01T00:30:00"), 40.0),
        ],
        "uid long, ts timestamp, rate double",
    )
    return left, right


def test_asof_backward_inclusive(spark, asof_frames):
    left, right = asof_frames
    got = {
        r["tag"]: r["rate_r"]
        for r in asof_join(left, right, on="uid").collect()
    }
    assert got == {"a": 10.0, "b": 20.0, "c": 30.0, "d": None, "e": None}


def test_asof_tolerance_and_matched_ts(spark, asof_frames):
    left, right = asof_frames
    rows = {
        r["tag"]: r
        for r in asof_join(
            left, right, on="uid", tolerance_sec=1800
        ).collect()
    }
    # 'c' is 30 min after its match -> kept; 'a' is 10 min after -> kept
    assert rows["c"]["rate_r"] == 30.0
    assert rows["a"]["ts_r"] == _ts("2024-01-01T00:00:00")
    # left row count preserved (left-outer semantics)
    assert len(rows) == 5


def test_asof_tolerance_drops_stale(spark, asof_frames):
    left, right = asof_frames
    rows = {
        r["tag"]: r["rate_r"]
        for r in asof_join(left, right, on="uid", tolerance_sec=60).collect()
    }
    # every match is older than 60s except none -> all NULL
    assert rows == {"a": None, "b": 20.0, "c": None, "d": None, "e": None}


def test_asof_matches_duckdb_asof(spark, asof_frames):
    """Cross-engine pin: DuckDB's native ASOF JOIN on the same frames."""
    import duckdb

    left, right = asof_frames
    lp, rp = left.toPandas(), right.toPandas()
    con = duckdb.connect()
    con.register("l", lp)
    con.register("r", rp)
    want = {
        t: v
        for t, v in con.execute(
            """SELECT l.tag, r.rate FROM l ASOF LEFT JOIN r
               ON l.uid = r.uid AND l.ts >= r.ts"""
        ).fetchall()
    }
    got = {
        r["tag"]: r["rate_r"]
        for r in asof_join(left, right, on="uid").collect()
    }
    assert got == want


def test_snapshot_asof(spark):
    claims = spark.createDataFrame(
        [
            ("e1", "pop", _ts("2024-01-01T00:00:00"), "1"),
            ("e1", "pop", _ts("2024-02-01T00:00:00"), "2"),
            ("e1", "pop", _ts("2024-03-01T00:00:00"), "3"),
            ("e2", "pop", _ts("2024-02-15T00:00:00"), "9"),
        ],
        "entity string, attr string, ts timestamp, value string",
    )
    snap = snapshot_asof(claims, _ts("2024-02-20T00:00:00"))
    got = {(r["entity"], r["value"]) for r in snap.collect()}
    assert got == {("e1", "2"), ("e2", "9")}


# ------------------------------------------------------------------ pagerank


def test_pagerank_two_node_cycle(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(e, iterations=5).collect()}
    assert got["a"] == pytest.approx(0.5)
    assert got["b"] == pytest.approx(0.5)


def test_pagerank_matches_numpy_power_iteration(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"),  # 'd' has in-degree 0; 'e' is dangling (no out-edges)
        ("c", "e"),
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(e, iterations=12).collect()}

    nodes = sorted({n for p in edges for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = [0.0] * n
    for s, _ in edges:
        out[idx[s]] += 1
    r = [1.0 / n] * n
    d = 0.85
    for _ in range(12):
        nxt = [0.0] * n
        for s, t in edges:
            nxt[idx[t]] += r[idx[s]] / out[idx[s]]
        dmass = sum(r[i] for i in range(n) if out[i] == 0)
        r = [(1 - d) / n + d * (nxt[i] + dmass / n) for i in range(n)]
    for node in nodes:
        assert got[node] == pytest.approx(r[idx[node]], rel=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


# -------------------------------------------------------------- gopher rules


def test_gopher_rules_flags(spark):
    good = " ".join(
        ["the", "be", "to", "of", "and", "that", "have", "with"]
        + [f"tok{i}" for i in range(60)]
    )
    docs = spark.createDataFrame(
        [
            (1, good),                              # passes everything
            (2, "short text only"),                 # fails word count
            (3, ("xx " * 80).strip()),              # fails stopwords + alpha ok
            (4, ("# " * 80).strip()),               # fails symbol + alpha
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_rules(docs, min_words=50).collect()}
    assert rows[1]["gopher_keep"] == 1
    assert rows[2]["r_word_count"] == 0 and rows[2]["gopher_keep"] == 0
    assert rows[3]["r_stop"] == 0 and rows[3]["r_alpha"] == 1
    assert rows[4]["r_symbol"] == 0 and rows[4]["r_alpha"] == 0
    # doc 3 is 'xx' repeated -> duplicate 3-grams dominate
    assert rows[3]["r_dup"] == 0


def test_gopher_empty_doc(spark):
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = gopher_rules(docs).first()
    assert r["r_word_count"] == 0 and r["gopher_keep"] == 0
    # 0-denominator ratios define to 0 -> ratio rules pass vacuously
    assert r["r_symbol"] == 1 and r["r_mean_len"] == 0


# ----------------------------------------------------------------- ntriples


def test_ntriples_shapes(spark):
    t = spark.createDataFrame(
        [
            ("Q1", "part_of", "Q2"),
            ("Q1", "label", 'say "hi"\tand\\run'),
        ],
        "subj string, pred_canon string, obj string",
    )
    lines = sorted(
        r["ntriple"] for r in to_ntriples(t, ref_preds=["part_of"]).collect()
    )
    assert lines[0] == (
        '<http://example.org/Q1> <http://example.org/label> '
        '"say \\"hi\\"\\tand\\\\run" .'
    )
    assert lines[1] == (
        "<http://example.org/Q1> <http://example.org/part_of> "
        "<http://example.org/Q2> ."
    )


# ------------------------------------------------------------------ C4 rules


def test_c4_line_rules(spark):
    from trustfuse_spark.operators.curation import c4_rules

    docs = spark.createDataFrame(
        [
            # 4 lines: kept / no terminal punct / too short / javascript
            (1, "one two three four five.\n"
                "six seven eight nine ten\n"
                "short line.\n"
                "uses JavaScript for styling ok."),
            # lorem ipsum doc: lines clean but doc-level flag kills keep
            (2, "lorem ipsum dolor sit amet one.\n"
                "alpha beta gamma delta eps two.\n"
                "alpha beta gamma delta eps tri."),
            # brace doc
            (3, "alpha beta gamma delta { code.\n"
                "alpha beta gamma delta eps two.\n"
                "alpha beta gamma delta eps tri."),
            # clean doc with >= 3 sentences -> keep
            (4, "alpha beta gamma delta one.\n"
                "alpha beta gamma delta two!\n"
                'alpha beta gamma delta "quoted"'),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in c4_rules(docs).collect()}

    r1 = rows[1]
    assert r1["n_lines"] == 4
    assert r1["n_kept_lines"] == 1  # only the first line survives all rules
    assert r1["clean_text"] == "one two three four five."
    assert r1["n_sentences"] == 1 and r1["c4_keep"] == 0

    r2 = rows[2]
    assert r2["n_kept_lines"] == 3 and r2["n_sentences"] == 3
    assert r2["c4_has_lorem"] == 1 and r2["c4_keep"] == 0

    r3 = rows[3]
    # the brace line still ENDS in '.', so it is kept at line level...
    assert r3["n_kept_lines"] == 3
    # ...but the doc-level brace flag vetoes the doc
    assert r3["c4_has_brace"] == 1 and r3["c4_keep"] == 0

    r4 = rows[4]
    assert r4["n_kept_lines"] == 3
    # sentence count comes from terminal marks in the CLEANED text: the
    # quoted line contributes 0 ('"' closes a line but is not [.!?])
    assert r4["n_sentences"] == 2
    assert r4["c4_keep"] == 0  # below min_sentences=3

    kept = c4_rules(docs, min_sentences=2).where(F.col("c4_keep") == 1)
    assert [r["doc_id"] for r in kept.collect()] == [4]


def test_c4_all_lines_dropped(spark):
    from trustfuse_spark.operators.curation import c4_rules

    docs = spark.createDataFrame(
        [(1, "no terminal punctuation here at all\nword")],
        "doc_id long, text string",
    )
    r = c4_rules(docs).first()
    assert r["n_kept_lines"] == 0 and r["clean_text"] == ""
    assert r["n_sentences"] == 0 and r["c4_keep"] == 0


def test_c4_min_words_line_knob(spark):
    from trustfuse_spark.operators.curation import c4_rules

    docs = spark.createDataFrame(
        [(1, "one two three.\nalpha beta gamma delta epsilon.")],
        "doc_id long, text string",
    )
    strict = c4_rules(docs, min_words_line=5).first()
    loose = c4_rules(docs, min_words_line=3).first()
    assert strict["n_kept_lines"] == 1
    assert loose["n_kept_lines"] == 2


def test_hits_matches_python_replay(spark):
    """HITS == the sequential L1-normalized replay on a small directed
    graph; sinks carry hub 0, pure sources auth 0; both vectors sum to 1."""
    from trustfuse_spark.operators.graph import hits

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("c", "e"),  # d: no in-edges; e: no out-edges
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(e, iterations=6).collect()}

    nodes = sorted({n for p in edges for n in p})
    hub = {n: 1.0 for n in nodes}
    for _ in range(6):
        auth = {n: 0.0 for n in nodes}
        for s, t in edges:
            auth[t] += hub[s]
        z = sum(auth.values())
        auth = {n: v / z for n, v in auth.items()}
        hub = {n: 0.0 for n in nodes}
        for s, t in edges:
            hub[s] += auth[t]
        z = sum(hub.values())
        hub = {n: v / z for n, v in hub.items()}
    for n in nodes:
        assert got[n][0] == pytest.approx(hub[n], rel=1e-9, abs=1e-12), n
        assert got[n][1] == pytest.approx(auth[n], rel=1e-9, abs=1e-12), n
    assert got["e"][0] == 0.0          # sink: never a hub
    assert got["d"][1] == 0.0          # source: never an authority
    assert sum(v[0] for v in got.values()) == pytest.approx(1.0, rel=1e-9)
    assert sum(v[1] for v in got.values()) == pytest.approx(1.0, rel=1e-9)
