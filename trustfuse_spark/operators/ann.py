"""Approximate nearest neighbors over embedding columns.

  brute_force_topk : exact cosine top-k — the correctness baseline.
                     queries are broadcast; candidates stream (scales with
                     the corpus, queries bounded).
  ivf_topk         : IVF-style two-stage search — k-means-lite centroids
                     (deterministic seeded init + a few Lloyd iterations as
                     DataFrame aggs), probe the nprobe nearest cells only.
                     The scale path: scan cost drops by ncells/nprobe.

Everything is expression-level (zip_with/aggregate dot products). At 100 TB
the candidate side stays partitioned; only centroids and queries broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query (ties -> smaller candidate id)."""
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    c = candidates.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    sims = q.crossJoin(c).select(
        "qid",
        "cid",
        (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def train_centroids(
    vectors: DataFrame,
    vec_col: str = "embedding",
    ncells: int = 16,
    iters: int = 3,
) -> DataFrame:
    """k-means-lite: deterministic seed centroids (hash-sampled rows), a few
    Lloyd rounds as join+groupBy. Returns (cell, centroid:array<double>)."""
    v = vectors.select(F.col(vec_col).alias("v"))
    seeded = v.withColumn("__h", F.xxhash64(F.col("v").cast("string")))
    w = Window.orderBy("__h")
    cents = (
        seeded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= ncells)
        .select(
            (F.col("__rn") - 1).alias("cell"),
            F.transform("v", lambda x: x.cast("double")).alias("centroid"),
        )
    )
    for _ in range(iters):
        assigned = _assign_cells(v, cents, "v")
        dim = vectors.select(F.size(vec_col).alias("d")).first()["d"]
        sums = assigned.groupBy("cell").agg(
            F.count("*").alias("n"),
            *[
                F.sum(F.element_at(F.col("v"), i + 1).cast("double")).alias(f"s{i}")
                for i in range(dim)
            ],
        )
        cents = sums.select(
            "cell",
            F.array(*[F.col(f"s{i}") / F.col("n") for i in range(dim)]).alias("centroid"),
        )
        cents = cents.localCheckpoint(eager=True)
    return cents


def _assign_cells(df: DataFrame, cents: DataFrame, vec_col: str) -> DataFrame:
    """Nearest centroid per row (broadcast centroids, argmin distance)."""
    dist = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("centroid"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    tagged = df.withColumn("__rid", F.monotonically_increasing_id())
    joined = tagged.crossJoin(F.broadcast(cents)).withColumn("__dist", dist)
    w = Window.partitionBy("__rid").orderBy(F.col("__dist").asc(), F.col("cell").asc())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__dist", "__rid", "centroid")
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    ncells: int = 16,
    nprobe: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF search: assign candidates to cells once, probe the nprobe nearest
    cells per query, exact cosine within the probed cells."""
    if centroids is None:
        centroids = train_centroids(candidates, vec_col, ncells)
    cand_cells = _assign_cells(
        candidates.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")),
        centroids,
        "cv",
    )
    # nprobe nearest cells per query
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    qc = q.crossJoin(F.broadcast(centroids))
    qdist = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("centroid"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("qid").orderBy(qdist.asc(), F.col("cell").asc())
    probed = (
        qc.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("qid", "qv", "cell")
    )
    sims = probed.join(cand_cells, "cell").select(
        "qid",
        "cid",
        (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
