"""Relationship extraction R1-R9 + strategy-order dedup D1 (SURVEY.md
§2.4-2.5).

The reference's Strategy 1 iterates, per sentence, the cross products of
entity-type buckets (relationship_logic.py:276-291); here those are
self-joins of the per-sentence mention frame on (conv_id, sent_idx) with
type predicates — fan-out bounded by sentence entity counts, never a
global cross join. Strategy 2 (SVO) consumes the kernel's SVO rows.

Everything is column expressions; the only ordering subtleties are:

* R1 indicator precedence — dict-then-list order (functions/indicators).
* R5 directionality — the first org (by sentence position) competes with
  each later org (relationship_logic.py:414-426).
* D1 survivorship — first strategy to emit a (lower(src), lower(dst),
  type) key wins, where "first" means: all Strategy-1 rows in sentence
  order with per-sentence rule order R1<R2<R3<R4<R5 and nested-loop pair
  order, then all SVO rows (relationship_logic.py:428-440). Encoded as a
  row_number window over (strat_group, sent_idx, rule_pri, ord_a, ord_b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.confidence import confidence_col
from ..functions.indicators import role_relationship_col
from ..rules import MIN_CONFIDENCE_THRESHOLD, VERB_TO_RELATIONSHIP
from .extraction import corrected_type_col

_CANDIDATE_COLS = [
    "conv_id", "sent_idx", "sentence", "source", "target", "type", "reason",
    "confidence", "verb", "strat_group", "rule_pri", "ord_a", "ord_b", "attach_metadata",
]


def sentence_mentions(kernel_rows: DataFrame) -> DataFrame:
    """Per-sentence structural mentions with corrected types and a
    per-type occurrence rank (the reference's persons/orgs/gpes/products
    list positions, relationship_logic.py:276-291). Raw (un-normalized)
    text — Strategy 1 endpoints are raw `ent.text`, which is what makes
    suffix-carrying endpoints die in validation (SURVEY.md §2.6 V2)."""
    m = (
        kernel_rows.filter(F.col("kind") == "mention")
        .withColumn("ctype", corrected_type_col(F.col("text"), F.col("label")))
        .filter(F.col("ctype").isin("PERSON", "ORG", "GPE", "PRODUCT", "EVENT"))
    )
    rank_w = Window.partitionBy("conv_id", "sent_idx", "ctype").orderBy("start_char")
    return m.select(
        "conv_id", "sent_idx", "sentence", "text", "ctype", "start_char"
    ).withColumn("type_rank", F.row_number().over(rank_w))


def _typed(mentions: DataFrame, ctype: str, alias: str, with_sentence: bool = False) -> DataFrame:
    """One type bucket. ``sentence`` is functionally determined by
    (conv_id, sent_idx), so only the LEFT side of each pair join carries
    it — the join key stays two short columns instead of hashing the full
    sentence string on both sides."""
    cols = ["conv_id", "sent_idx"] + (["sentence"] if with_sentence else [])
    return (
        mentions.filter(F.col("ctype") == ctype)
        .select(
            *cols,
            F.col("text").alias(f"{alias}_text"),
            F.col("type_rank").alias(f"{alias}_rank"),
        )
    )


def _pos(sent_lower, text_col):
    return F.instr(sent_lower, F.lower(text_col)) - 1


def _contains_any(sent_lower, phrases: list[str]):
    cond = F.lit(False)
    for p in phrases:
        cond = cond | (F.instr(sent_lower, p) > 0)
    return cond


def candidate_relationships(kernel_rows: DataFrame, persist: bool = True) -> DataFrame:
    """All rule candidates (pre-dedup, pre-validation), threshold applied.

    The ranked mention frame feeds five rule branches; persisting it
    avoids re-running its rank-window shuffle per branch."""
    mentions = sentence_mentions(kernel_rows)
    if persist:
        from pyspark import StorageLevel

        mentions = mentions.persist(StorageLevel.MEMORY_AND_DISK)
    persons = _typed(mentions, "PERSON", "p", with_sentence=True)
    orgs = _typed(mentions, "ORG", "o")
    orgs_s = _typed(mentions, "ORG", "o", with_sentence=True)
    gpes = _typed(mentions, "GPE", "g")
    products = _typed(mentions, "PRODUCT", "pr")
    join_key = ["conv_id", "sent_idx"]
    key = ["conv_id", "sent_idx", "sentence"]

    # R1 — role-based detection over persons x orgs
    # (relationship_logic.py:308-327). 0.95 on indicator hit; the 0.5
    # fallback never crosses the threshold, so misses are dropped here.
    r1_base = persons.join(orgs, join_key)
    sl = F.lower(F.col("sentence"))
    r1_type = role_relationship_col(sl, _pos(sl, F.col("p_text")), _pos(sl, F.col("o_text")))
    r1 = (
        r1_base.withColumn("type", r1_type)
        .filter(F.col("type").isNotNull())
        .select(
            *key,
            F.col("p_text").alias("source"),
            F.col("o_text").alias("target"),
            "type",
            F.concat(F.lit("Role-based detection: "), F.col("p_text"), F.lit(" → "), F.col("type"), F.lit(" → "), F.col("o_text")).alias("reason"),
            F.lit(0.95).alias("confidence"),
            F.lit(None).cast("string").alias("verb"),
            F.lit(0).alias("strat_group"),
            F.lit(1).alias("rule_pri"),
            F.col("p_rank").alias("ord_a"),
            F.col("o_rank").alias("ord_b"),
            F.lit(True).alias("attach_metadata"),
        )
    )

    # R2 — location detection over orgs x gpes (relationship_logic.py:329-355).
    r2_base = orgs_s.join(gpes, join_key)
    hq = _contains_any(sl, ["headquartered", "headquarters in", "headquartered in"])
    based = _contains_any(sl, ["based in", "located in"])
    r2 = r2_base.select(
        *key,
        F.col("o_text").alias("source"),
        F.col("g_text").alias("target"),
        F.when(hq, F.lit("HEADQUARTERED_IN")).otherwise(F.lit("LOCATED_IN")).alias("type"),
        F.lit(None).cast("string").alias("reason"),
        F.when(hq, F.lit(0.95)).when(based, F.lit(0.85)).otherwise(F.lit(0.65)).alias("confidence"),
        F.lit(None).cast("string").alias("verb"),
        F.lit(0).alias("strat_group"),
        F.lit(2).alias("rule_pri"),
        F.col("o_rank").alias("ord_a"),
        F.col("g_rank").alias("ord_b"),
        F.lit(False).alias("attach_metadata"),
    ).withColumn(
        "reason",
        F.concat(F.lit("Location detection: "), F.col("source"), F.lit(" → "), F.col("type"), F.lit(" → "), F.col("target")),
    )

    # R3 — production detection over orgs x products
    # (relationship_logic.py:360-389).
    r3_base = orgs_s.join(products, join_key)
    released = _contains_any(sl, ["released", "launched"])
    produced = _contains_any(sl, ["produced", "manufactures"])
    developed = _contains_any(sl, ["developed", "created"])
    r3 = r3_base.select(
        *key,
        F.col("o_text").alias("source"),
        F.col("pr_text").alias("target"),
        F.when(released, F.lit("RELEASED"))
        .when(produced, F.lit("PRODUCES"))
        .when(developed, F.lit("DEVELOPS"))
        .otherwise(F.lit("PRODUCES"))
        .alias("type"),
        F.lit(None).cast("string").alias("reason"),
        F.when(released, F.lit(0.9))
        .when(produced, F.lit(0.9))
        .when(developed, F.lit(0.85))
        .otherwise(F.lit(0.65))
        .alias("confidence"),
        F.lit(None).cast("string").alias("verb"),
        F.lit(0).alias("strat_group"),
        F.lit(3).alias("rule_pri"),
        F.col("o_rank").alias("ord_a"),
        F.col("pr_rank").alias("ord_b"),
        F.lit(True).alias("attach_metadata"),
    ).withColumn(
        "reason",
        F.concat(F.lit("Production detection: "), F.col("source"), F.lit(" → "), F.col("type"), F.lit(" → "), F.col("target")),
    )

    # R4 — list-pattern PRODUCES (relationship_logic.py:393-408).
    r4 = (
        r3_base.filter(_contains_any(sl, ["such as", "including", "like"]))
        .select(
            *key,
            F.col("o_text").alias("source"),
            F.col("pr_text").alias("target"),
            F.lit("PRODUCES").alias("type"),
            F.concat(F.lit("List-based production: "), F.col("o_text"), F.lit(" → PRODUCES → "), F.col("pr_text")).alias("reason"),
            F.lit(0.85).alias("confidence"),
            F.lit(None).cast("string").alias("verb"),
            F.lit(0).alias("strat_group"),
            F.lit(4).alias("rule_pri"),
            F.col("o_rank").alias("ord_a"),
            F.col("pr_rank").alias("ord_b"),
            F.lit(True).alias("attach_metadata"),
        )
    )

    # R5 — competition lists (relationship_logic.py:410-426): first org
    # (sentence position) competes with each later org; directional.
    primary = orgs_s.filter(F.col("o_rank") == 1).select(
        "conv_id", "sent_idx", "sentence", F.col("o_text").alias("primary_text")
    )
    others = orgs.filter(F.col("o_rank") >= 2)
    r5 = (
        primary.join(others, join_key)
        .filter(_contains_any(sl, ["competes with", "competitors like", "rivals like", "competing with"]))
        .select(
            *key,
            F.col("primary_text").alias("source"),
            F.col("o_text").alias("target"),
            F.lit("COMPETES_WITH").alias("type"),
            F.concat(F.lit("Competition detection: "), F.col("primary_text"), F.lit(" ← → COMPETES_WITH → "), F.col("o_text")).alias("reason"),
            F.lit(0.85).alias("confidence"),
            F.lit(None).cast("string").alias("verb"),
            F.lit(0).alias("strat_group"),
            F.lit(5).alias("rule_pri"),
            F.col("o_rank").alias("ord_a"),
            F.lit(0).alias("ord_b"),
            F.lit(False).alias("attach_metadata"),
        )
    )

    # R6/R7/R8 — SVO candidates (relationship_logic.py:176-256): verb
    # lemma through the broadcast map, confidence-scored, thresholded.
    verb_map = F.create_map(*[F.lit(x) for kv in VERB_TO_RELATIONSHIP.items() for x in kv])
    svo = (
        kernel_rows.filter(F.col("kind") == "svo")
        .withColumn("type", verb_map[F.col("label")])
        .filter(F.col("type").isNotNull())
        .withColumn("confidence", confidence_col(F.col("text"), F.col("obj"), F.col("label"), F.col("sentence")))
        .filter(F.col("confidence") >= MIN_CONFIDENCE_THRESHOLD)
        .select(
            *key,
            F.col("text").alias("source"),
            F.col("obj").alias("target"),
            "type",
            F.concat(F.lit("SVO pattern: '"), F.col("text"), F.lit("' "), F.col("label"), F.lit(" '"), F.col("obj"), F.lit("'")).alias("reason"),
            "confidence",
            F.col("label").alias("verb"),
            F.lit(1).alias("strat_group"),
            F.lit(6).alias("rule_pri"),
            F.col("svo_ord").alias("ord_a"),
            F.lit(0).alias("ord_b"),
            F.lit(True).alias("attach_metadata"),
        )
    )

    out = r1
    for part in (r2, r3, r4, r5, svo):
        out = out.unionByName(part)
    # R8 — confidence floor (already structural for R1/R5/SVO; applies to
    # nothing else since all Strategy-1 confidences are >= 0.65).
    return out.filter(F.col("confidence") >= MIN_CONFIDENCE_THRESHOLD)


def dedup_relationships(candidates: DataFrame) -> DataFrame:
    """D1 — first-seen wins on (lower(source), lower(target), type) in
    strategy emission order (relationship_logic.py:432-440). The
    survivor's reason/confidence/metadata come from the first strategy."""
    w = Window.partitionBy(
        "conv_id", F.lower(F.col("source")), F.lower(F.col("target")), "type"
    ).orderBy("strat_group", "sent_idx", "rule_pri", "ord_a", "ord_b")
    return candidates.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def enrich_with_metadata(relationships: DataFrame, sentence_metadata: DataFrame) -> DataFrame:
    """R9 — attach the sentence's first date/amount where the emitting rule
    attaches metadata (relationship_logic.py:296-306, 231-242)."""
    joined = relationships.join(sentence_metadata, ["conv_id", "sentence"], "left")
    return joined.select(
        relationships["*"],
        F.when(F.col("attach_metadata"), F.col("date")).alias("date"),
        F.when(F.col("attach_metadata"), F.col("amount")).alias("amount"),
    )


def extract_relationships(kernel_rows: DataFrame, sentence_metadata: DataFrame) -> DataFrame:
    """Full Strategy-1 + SVO pipeline through D1 and R9 (validation is a
    separate operator — operators/validation.py)."""
    cands = candidate_relationships(kernel_rows)
    deduped = dedup_relationships(cands)
    return enrich_with_metadata(deduped, sentence_metadata)
