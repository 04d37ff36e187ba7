"""Scalar-function parity vs Python originals (SURVEY §5.3.1) + loaders +
scale_units + reverse mapping + revision diff."""

import re

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from trustfuse_spark.functions import preprocess as P
from trustfuse_spark.functions.preprocess import extract_authors_py
from trustfuse_spark.operators.bucketize import reverse_map, revision_diff
from trustfuse_spark.operators.scale_units import scale_units
from trustfuse_spark.sources.loaders import load_tsv_bucket, wide_to_long


# -- Python twins of the reference scalar semantics (used as property oracles)
def py_extract_number(text):
    m = re.findall(r"[-+]?\d*\.\d+|\d+", str(text))
    return float(m[0]) if m else None


def py_extract_time_minutes(text):
    cleaned = re.sub(r"\(.*?\)", "", str(text))
    m = re.search(r"(\d{1,2}):(\d{2})", cleaned)
    return float(int(m.group(1)) * 60 + int(m.group(2))) if m else None


TEXTS = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    max_size=40,
)


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=30))
def test_extract_number_parity(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    got = [r["n"] for r in df.select(P.extract_number(F.col("s")).alias("n")).collect()]
    want = [py_extract_number(t) for t in texts]
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=30))
def test_extract_time_parity(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    got = [
        r["m"] for r in df.select(P.extract_time_minutes(F.col("s")).alias("m")).collect()
    ]
    want = [py_extract_time_minutes(t) for t in texts]
    assert got == want


def test_extract_authors_reference_cases(spark):
    cases = {
        "John Smith; Jane Doe": ["john smith", "jane doe"],
        "John Smith, Jane Doe, Bob Roe": ["smith, john", "doe, jane", "roe, bob"],
        "Edgar Allan Poe": ["edgar allan poe"],
        "Knuth, Donald Ervin": ["knuth, donald ervin"],  # 1 comma, 3 words
    }
    for raw, want in cases.items():
        assert extract_authors_py(raw) == want, raw
    df = spark.createDataFrame([(k,) for k in cases], ["s"])
    got = {r["s"]: r["a"] for r in df.select("s", P.extract_authors(F.col("s")).alias("a")).collect()}
    for raw, want in cases.items():
        assert got[raw] == want


def test_is_ip_or_mac(spark):
    df = spark.createDataFrame(
        [("192.168.0.1",), ("00:1A:2B:3C:4D:5E",), ("2001:db8::1",), ("alice",)],
        ["s"],
    )
    got = {r["s"]: r["b"] for r in df.select("s", P.is_ip_or_mac(F.col("s")).alias("b")).collect()}
    assert got["192.168.0.1"] and got["00:1A:2B:3C:4D:5E"] and got["2001:db8::1"]
    assert not got["alice"]


def test_scale_units(spark):
    rows = [
        (0, "A", "p", "s1", 324.0),
        (0, "A", "p", "s2", 32400.0),  # cm -> x0.1 twice
        (0, "A", "p", "s3", 0.324),  # km-ish -> x10 multiple times
        (0, "A", "p", "s4", None),  # untouched
        (0, "B", "p", "s1", 5.0),  # single value: untouched
    ]
    df = spark.createDataFrame(
        rows, "bucket_id int, entity string, attr string, source string, value_num double"
    )
    out = {
        (r["entity"], r["source"]): r["value_num"] for r in scale_units(df).collect()
    }
    vals = [out[("A", "s1")], out[("A", "s2")], out[("A", "s3")]]
    # all three on the same scale now (within one decade of each other)
    import math

    logs = [math.log10(v) for v in vals]
    assert max(logs) - min(logs) <= 0.8 * 2
    assert out[("A", "s4")] is None
    assert out[("B", "s1")] == 5.0


def test_loaders_book_mini(spark, tmp_path):
    tsv = tmp_path / "book.txt"
    tsv.write_text(
        "src1\t978-1\tSpark Book\tJohn Smith; Jane Doe\n"
        "src2\t978-1\tSpark Book\tJohn Smith\n"
        "src3\t978-2\tOther\t\n",
        encoding="ISO-8859-1",
    )
    wide = load_tsv_bucket(spark, str(tsv), ["Source", "ISBN", "Title", "Author list"])
    assert wide.columns == ["Source", "ISBN", "Title", "Author list"]
    long = wide_to_long(wide, "ISBN")
    rows = {(r["source"], r["entity"], r["attr"]): r["value_str"] for r in long.collect()}
    assert rows[("src1", "978-1", "Title")] == "Spark Book"
    assert ("src3", "978-2", "Author list") not in rows  # empty cell dropped
    assert long.filter("attr = 'Author list'").count() == 2


def test_reverse_map(spark):
    truth = spark.createDataFrame(
        [(0, "A", "p", "324.0")],
        "bucket_id int, entity string, attr string, value_str string",
    )
    seed = spark.createDataFrame(
        [
            (0, "A", "p", "324.0", "324 m", "d2"),
            (0, "A", "p", "324.0", "+324metre", "d1"),  # first by doc_id
            (0, "A", "p", "421.0", "421 m", "d0"),
        ],
        "bucket_id int, entity string, attr string, value_str string, seed_value string, doc_id string",
    )
    out = reverse_map(truth, seed).collect()[0]
    assert out["formatted_value"] == "+324metre"  # doc_id d1 < d2


def test_revision_diff(spark):
    rows = [
        ("A", 1, "u1", "p", ["x"]),
        ("A", 2, "u2", "p", ["x", "y"]),  # adds y
        ("A", 3, "u1", "p", ["z"]),  # adds z
    ]
    df = spark.createDataFrame(
        rows, "entity string, rev_no int, user string, prop string, values array<string>"
    ).withColumn("ts", F.lit("2020-01-01").cast("timestamp"))
    out = {(r["rev_no"], r["value"]) for r in revision_diff(df).collect()}
    assert out == {(1, "x"), (2, "y"), (3, "z")}
