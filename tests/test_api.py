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
