"""BM25 lexical retrieval / relevance-based data selection.

Training-data pipelines use BM25 for targeted data selection (pull the
corpus slice most relevant to a query set — the retrieval analogue of
DSIR's importance weights) and for benchmark-adjacent ranking during
decontamination triage. The operator is a pure DataFrame composition:
no index structure is materialized — the "inverted index" IS the
query-term-pruned postings aggregate.

Scale shape (100-TB contract): the query set is small (it is the thing
a human or an eval suite supplies), so its term dimension broadcasts.
The corpus side explodes to tokens but is immediately semi-joined
against that broadcast term dim — only postings of query terms ever
shuffle, a |q-terms|/|vocab| fraction of the corpus. Document length is
a per-row expression (``size(tokens)``) so it costs no shuffle; corpus
size and average length ride as a cross-joined 1-row aggregate, never a
driver collect. Per-term document frequencies aggregate over the pruned
postings (query-term-sized output, broadcast back). The final top-k is
a window partitioned by qid over already-aggregated (qid, doc) scores —
a hot query term fans its postings wide, but AQE's skew handling splits
the (qid, doc) aggregation and the window input is one row per scored
candidate, not per posting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trustfuse_spark.operators.lm import _tokens


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25 (Robertson et al.,
    TREC-3) with the Robertson–Spärck Jones idf
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``.

    Query term multiplicity is ignored (distinct query terms, weight 1)
    — the standard short-query convention. Ranking is deterministic:
    scores are rounded to 6 decimals BEFORE ranking and ties break on
    ascending ``doc_id``, so the emitted (score, rank) pair is stable
    across partitionings and engines (exact duplicate documents tie
    exactly — identical tf/dl give bit-identical scores — and order by
    id in any engine).

    Returns (qid, doc_id, score, rank, n_terms) with ``rank <= k``;
    queries whose terms match no document emit no rows.
    """
    qterm = queries.select(
        F.col(qid_col).alias("qid"),
        F.explode(_tokens(F.col(qtext_col))).alias("term"),
    ).distinct()
    qterm_dim = qterm.select("term").distinct()

    toks = docs.select(
        F.col(id_col).alias("__doc"),
        _tokens(F.col(text_col)).alias("__t"),
    )
    stats = toks.agg(
        F.count("*").alias("__n"),
        F.avg(F.size("__t")).alias("__avgdl"),
    )
    postings = (
        toks.select(
            "__doc",
            F.size("__t").alias("dl"),
            F.explode("__t").alias("term"),
        )
        .join(F.broadcast(qterm_dim), "term")
        .groupBy("__doc", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    df_t = postings.groupBy("term").agg(F.count("*").alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    sat = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl"))
    )
    scored = (
        postings.join(F.broadcast(df_t), "term")
        .join(F.broadcast(qterm), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "__doc")
        .agg(
            F.round(F.sum(idf * sat), 6).alias("score"),
            F.count("*").alias("n_terms"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("__doc").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            F.col("__doc").alias(id_col),
            "score",
            "rank",
            "n_terms",
        )
    )
