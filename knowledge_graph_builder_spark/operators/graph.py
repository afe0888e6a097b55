"""S4-S8 + D3/D4 + Q1-Q3 — graph materialization and read-side analytics
(SURVEY.md §2.1, §2.5, §2.8; reference graph_db.py).

Neo4j MERGE semantics re-expressed relationally:

* node MERGE on (name, type) — last-writer SET wins (graph_db.py:81-88):
  window keep-last per key.
* edge MERGE on (src, type, dst) with node MATCH by NAME + session
  (graph_db.py:131-134): inner-join both endpoints against the node set;
  dangling edges silently no-op exactly like a failed Cypher MATCH.
* event nodes MERGE on (name, type) + one INVOLVES edge per participant,
  where the participant must MATCH an entity node by name
  (graph_db.py:96-119): explode + semi-join.
* session clear (graph_db.py:147-151) = partition-predicate delete.

Tables write as parquet partitioned by session bucket; with an Iceberg
catalog the same frames go through MERGE INTO (upsert) instead of the
overwrite — the dedup logic is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def build_nodes(entities: DataFrame, session_id: str = "batch") -> DataFrame:
    """D3 — MERGE on (name, type), last writer's properties win. Write
    order in the reference is entity list order per document, documents in
    arrival order; reproduced deterministically as (conv_id, is_forced,
    start_char) descending-last."""
    w = Window.partitionBy("text", "type").orderBy(
        F.col("conv_id").desc(), F.col("is_forced").desc(), F.col("start_char").desc()
    )
    return (
        entities.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("text").alias("name"),
            "type",
            F.lit(session_id).alias("session_id"),
            F.col("conv_id").alias("document_id"),
            "source_sentence",
        )
    )


def build_edges(triples: DataFrame, nodes: DataFrame, session_id: str = "batch") -> DataFrame:
    """D4 + S5 — dedup on (src, type, dst) keeping the last writer, then
    drop edges whose endpoints have no node (the reference's silent
    MATCH-miss, graph_db.py:131-134 — matching is by NAME only)."""
    w = Window.partitionBy("source", "type", "target").orderBy(F.col("document_id").desc())
    deduped = (
        triples.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    names = nodes.select(F.col("name")).distinct()
    anchored = (
        deduped.join(names.withColumnRenamed("name", "source"), "source", "left_semi")
        .join(names.withColumnRenamed("name", "target"), "target", "left_semi")
    )
    return anchored.select(
        F.col("source").alias("src"),
        "type",
        F.col("target").alias("dst"),
        "reason",
        "confidence",
        "verb",
        "date",
        "amount",
        "source_sentence",
        "document_id",
        F.lit(session_id).alias("session_id"),
    )


def build_event_nodes_and_edges(events: DataFrame, nodes: DataFrame, session_id: str = "batch") -> tuple[DataFrame, DataFrame]:
    """S6 — event nodes (MERGE on name+type, last writer) and INVOLVES
    edges to participants that resolve to entity nodes by name."""
    w = Window.partitionBy("name", "event_type").orderBy(F.col("document_id").desc())
    event_nodes = (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "name",
            "event_type",
            "date",
            "location",
            "amount",
            "context",
            "document_id",
            "confidence",
            F.lit(session_id).alias("session_id"),
        )
    )
    names = nodes.select("name").distinct()
    involves = (
        events.select("document_id", "name", F.explode("participants").alias("participant"))
        .join(names.withColumnRenamed("name", "participant"), "participant", "left_semi")
        .select(
            F.col("name").alias("src"),
            F.lit("INVOLVES").alias("type"),
            F.col("participant").alias("dst"),
            F.lit(None).cast("string").alias("reason"),
            F.lit(None).cast("double").alias("confidence"),
            F.lit(None).cast("string").alias("verb"),
            F.lit(None).cast("string").alias("date"),
            F.lit(None).cast("string").alias("amount"),
            F.lit(None).cast("string").alias("source_sentence"),
            "document_id",
            F.lit(session_id).alias("session_id"),
        )
        .dropDuplicates(["src", "type", "dst"])
    )
    return event_nodes, involves


def insights(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Q1 — per-session stats (graph_db.py:153-179): distinct node count,
    distinct edge count, avg confidence rounded to 2dp."""
    n = nodes.groupBy("session_id").agg(F.countDistinct("name", "type").alias("total_entities"))
    e = edges.groupBy("session_id").agg(
        F.countDistinct("src", "type", "dst").alias("total_relationships"),
        F.round(F.avg("confidence"), 2).alias("avg_confidence"),
    )
    return n.join(e, "session_id", "left")


def entity_type_histogram(nodes: DataFrame) -> DataFrame:
    """Q1b — entity-type distribution (graph_db.py:166-171)."""
    return nodes.groupBy("session_id", "type").agg(F.countDistinct("name").alias("count"))


# Q2 color map — exact values from reference graph_db.py:205-219, covering
# both entity types and event types in ONE map (the reference keys event
# nodes by their event type, not a generic "Event" group).
TYPE_COLORS = {
    "PERSON": "#3b82f6",
    "ORG": "#10b981",
    "GPE": "#f59e0b",
    "PRODUCT": "#8b5cf6",
    "FAC": "#06b6d4",
    "WORK_OF_ART": "#a855f7",
    # event types
    "Acquisition": "#fbbf24",
    "ProductLaunch": "#ec4899",
    "LeadershipChange": "#f59e0b",
    "Conference": "#8b5cf6",
    "FundingRound": "#10b981",
    "Other": "#6b7280",
}
ENTITY_DEFAULT_COLOR = "#6b7280"  # graph_db.py:233
EVENT_DEFAULT_COLOR = "#fbbf24"  # graph_db.py:252
EDGE_COLOR = "#64748b"  # graph_db.py:290


def _color_expr(group_col, default: str):
    color = None
    for t, c in TYPE_COLORS.items():
        cond = group_col == t
        color = F.when(cond, F.lit(c)) if color is None else color.when(cond, F.lit(c))
    return color.otherwise(F.lit(default))


def viz_nodes(nodes: DataFrame, event_nodes: DataFrame | None = None) -> DataFrame:
    """Q2 — vis-network node projection (graph_db.py:186-256): entity nodes
    (shape dot) with per-type group/color, event nodes (shape diamond)
    grouped BY EVENT TYPE with the event-type colors."""
    ents = nodes.select(
        F.col("name").alias("id"),
        F.col("name").alias("label"),
        F.col("type").alias("group"),
        _color_expr(F.col("type"), ENTITY_DEFAULT_COLOR).alias("color"),
        # graph_db.py:225-227: "label (group)" + optional source snippet
        F.concat(
            F.col("name"), F.lit(" ("), F.col("type"), F.lit(")"),
            F.when(
                F.col("source_sentence").isNotNull(),
                F.concat(F.lit("\n\nSource: "), F.substring("source_sentence", 1, 100), F.lit("...")),
            ).otherwise(F.lit("")),
        ).alias("title"),
        F.lit("dot").alias("shape"),
    )
    if event_nodes is None:
        return ents
    evs = event_nodes.select(
        F.col("name").alias("id"),
        F.col("name").alias("label"),
        F.col("event_type").alias("group"),
        _color_expr(F.col("event_type"), EVENT_DEFAULT_COLOR).alias("color"),
        # graph_db.py:240-246: typed tooltip + optional date/amount/context
        F.concat(
            F.lit("EVENT: "), F.col("name"), F.lit("\nType: "), F.col("event_type"),
            F.when(F.col("date").isNotNull(), F.concat(F.lit("\nDate: "), F.col("date"))).otherwise(F.lit("")),
            F.when(F.col("amount").isNotNull(), F.concat(F.lit("\nAmount: "), F.col("amount"))).otherwise(F.lit("")),
            F.when(
                F.col("context").isNotNull(),
                F.concat(F.lit("\n\nContext: "), F.substring("context", 1, 100), F.lit("...")),
            ).otherwise(F.lit("")),
        ).alias("title"),
        F.lit("diamond").alias("shape"),
    )
    return ents.unionByName(evs)


def viz_edges(edges: DataFrame) -> DataFrame:
    """Q3 — vis-network edge projection (graph_db.py:259-292): confidence
    defaults to 1.0 when absent/falsy (graph_db.py:270), width =
    max(2, confidence*4), opacity = min(1.0, confidence+0.3), fixed edge
    color #64748b."""
    conf = F.when(
        F.col("confidence").isNull() | (F.col("confidence") == 0), F.lit(1.0)
    ).otherwise(F.col("confidence"))
    return edges.select(
        F.col("src").alias("from"),
        F.col("dst").alias("to"),
        F.col("type").alias("label"),
        conf.alias("confidence"),
        F.greatest(F.lit(2.0), conf * 4).alias("width"),
        F.least(F.lit(1.0), conf + 0.3).alias("opacity"),
        F.lit(EDGE_COLOR).alias("color"),
    )


def clear_session(df: DataFrame, session_id: str) -> DataFrame:
    """S8 — session clear as a predicate (DELETE WHERE on Iceberg;
    filtered rewrite on parquet). Null-preserving: rows with no
    session_id must survive a clear of any named session."""
    return df.filter(F.col("session_id").isNull() | (F.col("session_id") != session_id))
