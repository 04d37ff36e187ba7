"""Streaming sketch twins == batch sketches on the union of micro-batches
(the sessionizer-twin contract)."""

from pyspark.sql import functions as F


def _write_chunks(spark, path):
    rows1 = [(i, " ".join(f"w{(i * 3 + j) % 29}" for j in range(8))) for i in range(60)]
    rows2 = [(i, " ".join(f"w{(i * 5 + j) % 31}" for j in range(8))) for i in range(60, 120)]
    spark.createDataFrame(rows1, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{path}/c1")
    spark.createDataFrame(rows2, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{path}/c2")
    return spark.createDataFrame(rows1 + rows2, "doc_id long, text string")


def test_stream_hll_and_cms_match_batch(spark, tmp_path):
    from trustfuse_spark.operators.sketch import count_min_sketch, hyperloglog
    from trustfuse_spark.streaming.sketch import (
        stream_cms_cells,
        stream_hll_registers,
    )

    src = str(tmp_path / "in")
    full = _write_chunks(spark, src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )

    q1 = (
        stream_hll_registers(stream, m=32, portable_hash=True)
        .writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q1.awaitTermination(120), "hll drain timed out"
    got = sorted(map(tuple, spark.table("hll_regs").collect()))
    want = sorted(
        map(tuple, hyperloglog(full, m=32, portable_hash=True).collect())
    )
    assert got == want

    q2 = (
        stream_cms_cells(stream, width=32, depth=2, portable_hash=True)
        .writeStream.format("memory")
        .queryName("cms_cells")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(120), "cms drain timed out"
    got = sorted(map(tuple, spark.table("cms_cells").collect()))
    want = sorted(
        map(
            tuple,
            count_min_sketch(full, width=32, depth=2, portable_hash=True).collect(),
        )
    )
    assert got == want
