"""Library API + CLI surface tests."""

import pyspark.sql.functions as F

from trustfuse_spark.api import ClaimsDataset, register_model
from trustfuse_spark.operators.fusion.base import FusionResult


def test_api_tsv_roundtrip(spark, tmp_path):
    tsv = tmp_path / "book.txt"
    tsv.write_text(
        "src1\t978-1\tSpark Book\t324 m\n"
        "src2\t978-1\tSpark Book\t32400 cm\n"
        "src3\t978-1\tWrong Title\t500 m\n",
        encoding="ISO-8859-1",
    )
    ds = ClaimsDataset.from_tsv(
        spark, str(tsv), ["Source", "ISBN", "Title", "Height"],
        entity_col="ISBN", attr_types={"Height": "quantity"},
    ).preprocess()
    res = ds.fuse("majority")
    truth = {r["attr"]: r for r in res.truth.collect()}
    assert truth["Title"]["value_str"] == "Spark Book"
    assert truth["Height"]["value_num"] == 324.0  # unit-normalized mode/median
    triples = ds.triples(res)
    assert {r["pred"] for r in triples.collect()} == {"Title", "Height"}


def test_api_evaluate(spark):
    claims = spark.createDataFrame(
        [
            (0, "s1", "A", "p", "x", None, "string"),
            (0, "s2", "A", "p", "x", None, "string"),
            (0, "s3", "A", "p", "y", None, "string"),
        ],
        "bucket_id int, source string, entity string, attr string,"
        " value_str string, value_num double, claim_type string",
    )
    gt = spark.createDataFrame(
        [(0, "A", "p", ["x"])],
        "bucket_id int, entity string, attr string, gt_values array<string>",
    )
    ds = ClaimsDataset.from_long(claims, gt)
    res = ds.fuse("majority")
    row = ds.evaluate(res, per_attr=False).collect()[0]
    assert row["p"] == 1.0 and row["r"] == 1.0


def test_register_custom_model(spark):
    def constant_model(claims, **_):
        truth = (
            claims.groupBy("bucket_id", "entity", "attr")
            .agg(F.min("value_str").alias("value_str"))
            .withColumn("value_num", F.lit(None).cast("double"))
            .withColumn("is_numeric", F.lit(False))
        )
        weights = (
            claims.select("bucket_id", "source").distinct()
            .withColumn("weight", F.lit(1.0))
        )
        return FusionResult(truth=truth, weights=weights)

    register_model("constant_min", constant_model)
    claims = spark.createDataFrame(
        [(0, "s1", "A", "p", "b", None, "string"), (0, "s2", "A", "p", "a", None, "string")],
        "bucket_id int, source string, entity string, attr string,"
        " value_str string, value_num double, claim_type string",
    )
    res = ClaimsDataset.from_long(claims).fuse("constant_min")
    assert res.truth.collect()[0]["value_str"] == "a"


def test_curate_pipeline_cli(spark, tmp_path):
    """CLI twin for the document side: parquet in -> packed parquet out +
    one JSON stats line."""
    import json

    from trustfuse_spark.curate_pipeline import main

    # distinct docs (pseudo-random per-doc vocabulary) so only the PLANTED
    # pairs collide — words like "tok{i}q{j}z" are NOT distinct enough at
    # the char-3-shingle level (measured J=0.94 between doc 2 and doc 22)
    def word(i, j):
        v = (i * 1000003 + j * 7919) % (26 ** 4)
        s = ""
        for _ in range(4):
            s += chr(97 + v % 26)
            v //= 26
        return s

    def doc(i):
        uniq = " ".join(word(i, j) for j in range(20))
        return f"the document number {i} is about {uniq} and the end"

    rows = [(i, doc(i), "web" if i % 2 else "books") for i in range(40)]
    rows.append((100, doc(0), "web"))                        # exact dup of 0
    rows.append((101, doc(1).replace(word(1, 3), word(1, 3) + "x"), "web"))  # near dup of 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "packed")
    docs.write.parquet(in_dir)

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([
            "--docs", in_dir, "--out", out_dir, "--capacity", "256",
            "--rates", '{"web": 1.0, "books": 1.0}',
            "--neardup-threshold", "0.9",
        ])
    assert rc == 0
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["n_docs_in"] == 42
    assert stats["n_neardup_dropped"] >= 1  # the planted near-dup clusters
    packed = spark.read.parquet(out_dir)
    ids = {r["doc_id"] for r in packed.collect()}
    assert len({0, 100} & ids) <= 1  # exact dup collapsed
    assert len({1, 101} & ids) <= 1  # near dup collapsed
    assert stats["n_docs_packed"] == packed.count() == len(ids)
    assert 38 <= len(ids) <= 40
    assert stats["n_bins"] >= 2


def test_driver_gate_registry_cap():
    """The driver's CORRECTNESS gate emits at most 50 rows (observed r4:
    entries past #50 get NO row). Guard the contract: exactly 50 queries,
    a same-keyed oracle for every one, and all entries callable."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "spark_entry_gate_test", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q, o = mod.queries(), mod.oracle_sql()
    assert len(q) == 50, f"driver cap is 50 rows; got {len(q)} queries"
    assert set(q) == set(o), (sorted(set(q) - set(o)), sorted(set(o) - set(q)))
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())
