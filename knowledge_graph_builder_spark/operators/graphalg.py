"""Graph analytics over the materialized node/edge tables.

Beyond the reference's read-side insights (graph_db.py:153-179 — counts
and averages only), a KG at 10^12-turn scale needs structural analytics:
degree statistics (hub detection, skew diagnosis for the canonicalization
blocking caps) and PageRank-style centrality (entity importance ranking
for downstream sampling/curation). Both are DataFrame-native; PageRank is
the engine's second driver-controlled iterative loop (after connected
components) and follows the same localCheckpoint-per-iteration pattern to
keep lineage bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_stats(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Per-node out/in/total degree. One aggregation per direction over
    the edge list, joined on the node id — partial-aggregable, no skew
    hazard (a hot node is one row per aggregate)."""
    out_deg = edges.groupBy(F.col(src_col).alias("node")).agg(F.count("*").alias("out_degree"))
    in_deg = edges.groupBy(F.col(dst_col).alias("node")).agg(F.count("*").alias("in_degree"))
    return (
        out_deg.join(in_deg, "node", "full_outer")
        .na.fill(0, ["out_degree", "in_degree"])
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Standard damped PageRank over a directed edge list.

    rank_{t+1}(v) = (1-d)/N + d * (sum of rank_t(u)/outdeg(u) over
    in-neighbors u) + d * dangling_mass/N (dangling nodes' rank is
    redistributed uniformly, keeping the distribution normalized).

    Each iteration is one join + one aggregation; the rank frame is
    localCheckpoint'd per iteration so the plan does not grow with the
    iteration count (same discipline as the connected-components loop).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    out_deg = e.groupBy("src").agg(F.count("*").alias("out_degree"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        with_deg = ranks.join(out_deg, ranks["node"] == out_deg["src"], "left")
        # dangling mass: rank held by nodes with no out-edges
        dangling = (
            with_deg.filter(F.col("out_degree").isNull()).agg(F.sum("rank").alias("m")).collect()[0]["m"]
            or 0.0
        )
        contribs = (
            with_deg.filter(F.col("out_degree").isNotNull())
            .select("node", (F.col("rank") / F.col("out_degree")).alias("share"))
            .join(e, F.col("node") == e["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("incoming"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .na.fill(0.0, ["incoming"])
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * (F.col("incoming") + F.lit(dangling / n))).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
