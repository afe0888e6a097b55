"""V1-V3 — semantic validation (SURVEY.md §2.6).

Reproduces reference semantic_validator.py:59-166:

* endpoint resolution is an EXACT, CASE-SENSITIVE string match of the
  relationship endpoint against the (normalized, whitelisted) entity
  texts — `next(e for e in entities if e.text == rel.source)`. Two
  load-bearing consequences (SURVEY.md §2.6):
  (a) SVO endpoints carrying determiners ("the iPhone") never resolve;
  (b) Strategy-1 endpoints are raw sentence text while entities are
      suffix-normalized, so "Apple Inc." edges die while "Apple" lives.
* `next()` takes the FIRST matching entity in list order; reproduced with
  a first-per-(conv, text) window before the join.
* the relationship type must parse as an AllowedRelationshipType and the
  (source_norm, type, target_norm) pair must be whitelisted — both via a
  broadcast semi-join against the tiny rule table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..rules import SEMANTIC_RULES, SPACY_TO_NORMALIZED


def normalized_type_col(spacy_type):
    """V3/E4 mapping (reference extraction_rules.py:85-90)."""
    chain = None
    for raw, norm in SPACY_TO_NORMALIZED.items():
        chain = (
            F.when(spacy_type == raw, F.lit(norm))
            if chain is None
            else chain.when(spacy_type == raw, F.lit(norm))
        )
    return chain.otherwise(F.lit(None))


def semantic_rules_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        SEMANTIC_RULES, schema="rel_type string, src_norm string, dst_norm string"
    )


def first_entity_by_text(entities: DataFrame) -> DataFrame:
    """One row per (conv_id, exact text): the first entity in reference
    list order (document order; force-detected entities were appended
    last — semantic_validator.py:84-85 uses next() over that list)."""
    w = Window.partitionBy("conv_id", "text").orderBy(
        F.col("is_forced").asc(), F.col("start_char").asc()
    )
    return (
        entities.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("conv_id", "text", normalized_type_col(F.col("type")).alias("norm_type"))
    )


def validate_relationships(relationships: DataFrame, entities: DataFrame) -> DataFrame:
    """V2 — inner-join both endpoints (case-sensitive), then semi-join the
    (type, src_norm, dst_norm) triple against the rule table. Rows that
    fail any step silently disappear, matching the reference's filter."""
    spark = relationships.sparkSession
    lookup = first_entity_by_text(entities)

    src = lookup.select(
        F.col("conv_id").alias("_sc"), F.col("text").alias("_st"), F.col("norm_type").alias("src_norm")
    )
    dst = lookup.select(
        F.col("conv_id").alias("_dc"), F.col("text").alias("_dt"), F.col("norm_type").alias("dst_norm")
    )

    resolved = (
        relationships.join(
            src, (relationships["conv_id"] == src["_sc"]) & (relationships["source"] == src["_st"])
        )
        .join(dst, (relationships["conv_id"] == dst["_dc"]) & (relationships["target"] == dst["_dt"]))
        .drop("_sc", "_st", "_dc", "_dt")
        .filter(F.col("src_norm").isNotNull() & F.col("dst_norm").isNotNull())
    )

    rules = F.broadcast(semantic_rules_df(spark))
    return (
        resolved.join(
            rules,
            (resolved["type"] == rules["rel_type"])
            & (resolved["src_norm"] == rules["src_norm"])
            & (resolved["dst_norm"] == rules["dst_norm"]),
            "left_semi",
        )
    )


def to_triples(validated: DataFrame) -> DataFrame:
    """Project the validated frame onto the public TRIPLES schema."""
    return validated.select(
        F.col("conv_id").alias("document_id"),
        "source",
        "target",
        "type",
        "reason",
        "confidence",
        "verb",
        F.col("sentence").alias("source_sentence"),
        "date",
        "amount",
    )
