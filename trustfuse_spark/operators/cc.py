"""Connected components over an edge list — the canonicalization core
(north_star: iterative min-id propagation over the mention graph).

Implements the alternating large-star / small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond", public literature) as
DataFrame aggregations:

  large-star: per node u, every strictly-larger neighbor points at
              m = min(N(u) ∪ {u})
  small-star: per node u, every not-larger neighbor (and u) points at
              m = min(N≤(u) ∪ {u})

Both are one groupBy + one explode; the pair converges in O(log n) rounds.
Convergence check = one scalar agg (edge-set hash-sum). Skew: hub nodes
(a celebrity entity in a mention graph) concentrate one group; the groupBy
is an algebraic min + collect of DISTINCT smaller neighbors, and AQE's skew
handling splits the shuffle — for adversarial hubs pass `salt_hubs=True`
to pre-aggregate neighbor minima in two phases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trustfuse_spark.operators.fusion.base import CheckpointRotator, checkpoint


def _degree_capped_min(edges: DataFrame, salt: int) -> DataFrame:
    """Two-phase (salted) min-neighbor per node for hub resilience."""
    salted = edges.withColumn("__salt", F.pmod(F.xxhash64("dst"), F.lit(salt)))
    partial = salted.groupBy("src", "__salt").agg(F.min("dst").alias("m"))
    return partial.groupBy("src").agg(F.min("m").alias("m"))


def _star_round(edges: DataFrame, large: bool, salt_hubs: bool) -> DataFrame:
    """One large- or small-star round over a symmetric edge list."""
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if large:
        nbrs = sym  # all neighbors participate in min; larger ones re-point
    else:
        nbrs = sym.filter(F.col("dst") <= F.col("src"))
    if salt_hubs:
        mins = _degree_capped_min(nbrs, 32)
    else:
        mins = nbrs.groupBy("src").agg(F.min("dst").alias("m"))
    mins = mins.withColumn("m", F.least("m", F.col("src")))
    if large:
        out = (
            sym.filter(F.col("dst") > F.col("src"))
            .join(mins, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
    else:
        out = (
            nbrs.join(mins, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .union(mins.select(F.col("src"), F.col("m").alias("dst")))
        )
    return out.filter(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
    salt_hubs: bool = False,
) -> DataFrame:
    """-> (node, component) with component = min node id of the component.

    Nodes are whatever orderable type the edge columns carry (long ids
    preferred at scale — hash surface forms to ids first).
    """
    e = checkpoint(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
            F.col("src") != F.col("dst")
        ).distinct()
    )
    all_nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()

    rot = CheckpointRotator(edges.sparkSession)
    prev_sig = None
    for _ in range(max_rounds):
        e = _star_round(e, large=True, salt_hubs=salt_hubs)
        e = rot.rotate(_star_round(e, large=False, salt_hubs=salt_hubs))
        sig_row = e.agg(
            F.count("*").alias("n"),
            # order-insensitive, overflow-free edge-set signature (ANSI-safe)
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig

    # converged edge list is (node -> root); isolated nodes are their own root
    roots = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    return (
        all_nodes.join(roots, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
        .union(
            # roots themselves
            e.select(F.col("dst").alias("node"), F.col("dst").alias("component")).distinct()
        )
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
