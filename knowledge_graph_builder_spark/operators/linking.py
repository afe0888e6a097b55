"""Entity-link scoring (north_star: "mention detection and entity-link
scoring run as vectorized Arrow batches / no per-row Python").

Links raw mention surface forms to canonical entity names with a scored
ranking — the scoring layer between extraction (which emits surface
forms) and canonicalization (which merges aliases):

1. blocking: candidate (mention, entity) pairs share a name token
   (bounded blocks, same guard pattern as canonicalize/dedup);
2. scoring — pure column expressions:
     0.5 * token-set Jaccard
   + 0.3 * exact case-insensitive match
   + 0.2 * containment (one name contains the other);
3. ranking: top-1 per mention via window, score floor applied.

All JVM-side column math — the "vectorized, no per-row Python" part is
structural: mentions arrive from the Arrow kernel, scoring never leaves
Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MIN_LINK_SCORE = 0.35
MAX_LINK_BLOCK = 200


def _tokens(col: Column) -> Column:
    return F.array_remove(
        F.array_distinct(F.split(F.lower(F.trim(col)), r"[^a-z0-9]+")), ""
    )


def link_score_col(mention: Column, entity: Column) -> Column:
    """Composite link score in [0, 1]."""
    mt, et = _tokens(mention), _tokens(entity)
    inter = F.size(F.array_intersect(mt, et))
    union = F.size(F.array_union(mt, et))
    jaccard = inter / F.greatest(union, F.lit(1))
    ml, el = F.lower(F.trim(mention)), F.lower(F.trim(entity))
    exact = F.when(ml == el, F.lit(1.0)).otherwise(F.lit(0.0))
    contains = F.when(ml.contains(el) | el.contains(ml), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(0.5 * jaccard + 0.3 * exact + 0.2 * contains, 4)


def link_mentions(
    mentions: DataFrame,
    entities: DataFrame,
    mention_col: str = "mention",
    entity_col: str = "name",
    min_score: float = MIN_LINK_SCORE,
    max_block: int = MAX_LINK_BLOCK,
) -> DataFrame:
    """(mention) x (entity) -> best-scoring link per mention.

    Returns (mention, entity, link_score) with one row per mention that
    cleared ``min_score``. Token blocking bounds the candidate fan-out;
    oversized token blocks are dropped (stop-token guard), recall for
    those comes from other, rarer tokens of the same name.
    """
    m = mentions.select(F.col(mention_col).alias("mention")).distinct()
    e = entities.select(F.col(entity_col).alias("entity")).distinct()

    m_keys = m.select("mention", F.explode(_tokens(F.col("mention"))).alias("tok"))
    e_keys = e.select("entity", F.explode(_tokens(F.col("entity"))).alias("tok"))
    # stop-token guard on the ENTITY side (the large, reusable dimension)
    tok_sizes = e_keys.groupBy("tok").count().filter(F.col("count") <= max_block)
    e_keys = e_keys.join(tok_sizes.select("tok"), "tok", "left_semi")

    pairs = m_keys.join(e_keys, "tok").select("mention", "entity").distinct()
    scored = pairs.withColumn("link_score", link_score_col(F.col("mention"), F.col("entity")))
    w = Window.partitionBy("mention").orderBy(F.col("link_score").desc(), F.col("entity"))
    return (
        scored.filter(F.col("link_score") >= min_score)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
