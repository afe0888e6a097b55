"""EV1-EV6 + D2 — event extraction (SURVEY.md §2.7; reference
event_extraction.py).

Sentence-level pattern matching over the FINAL (whitelisted) entity set:

* EV2 alignment joins entities to sentences by sentence STRING equality
  (event_extraction.py:84-97) — force-detected entities (source_sentence
  "") never align, and duplicate sentence strings share entities; both
  reproduced by joining on (conv_id, sentence).
* EV1 trigger detection is an ordered `when` chain over the pattern
  families (dict order) and, within a family, trigger list order — the
  matched trigger's word count fixes the confidence.
* EV3 gating: OTHER always skipped; >=1 entity of a required type; >=1
  participant.
* EV5 naming templates including the ProductLaunch org-vs-product
  NAME-BASED heuristic ('Inc'/'Corp' substring or single word —
  event_extraction.py:177).
* D2 dedup: first-seen on (event_type, sorted participants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..rules import EVENT_PATTERNS, EVENT_PARTICIPANT_TYPES, event_trigger_confidence


def _event_type_cols() -> tuple:
    """(event_type_col, confidence_col) — ordered trigger chains over the
    lowered sentence."""
    sl = F.lower(F.col("sentence"))
    type_chain = None
    conf_chain = None
    for event_type, pattern in EVENT_PATTERNS:
        for trigger in pattern["triggers"]:
            cond = F.instr(sl, trigger) > 0
            conf = event_trigger_confidence(trigger)
            type_chain = F.when(cond, F.lit(event_type)) if type_chain is None else type_chain.when(cond, F.lit(event_type))
            conf_chain = F.when(cond, F.lit(conf)) if conf_chain is None else conf_chain.when(cond, F.lit(conf))
    return type_chain.otherwise(F.lit("Other")), conf_chain.otherwise(F.lit(0.3))


def _required_ok_col():
    """EV3: any required entity type present for the detected family."""
    cond = F.lit(False)
    for event_type, pattern in EVENT_PATTERNS:
        present = F.lit(False)
        for req in pattern["required_entities"]:
            present = present | F.array_contains(F.col("entity_types"), req)
        cond = F.when(F.col("event_type") == event_type, present).otherwise(cond)
    return cond


def extract_events(kernel_rows: DataFrame, entities: DataFrame, sentence_metadata: DataFrame) -> DataFrame:
    """kernel sentences + final entities + per-sentence metadata -> events."""
    sentences = (
        kernel_rows.filter(F.col("kind") != "cand")  # cand rows carry no sentence text
        .select("conv_id", "sent_idx", "sentence")
        .groupBy("conv_id", "sentence")
        .agg(F.min("sent_idx").alias("sent_idx"))
    )

    # EV2 — align final entities by sentence string; keep entity order
    # (document order == start_char of the first-seen occurrence).
    ents = entities.select(
        "conv_id",
        F.col("source_sentence").alias("sentence"),
        "text",
        "type",
        "start_char",
    )
    grouped = (
        ents.groupBy("conv_id", "sentence")
        .agg(
            F.array_sort(F.collect_list(F.struct("start_char", "text", "type"))).alias("ents"),
        )
        .select(
            "conv_id",
            "sentence",
            F.transform("ents", lambda e: e["type"]).alias("entity_types_ordered"),
            F.filter(
                F.transform("ents", lambda e: F.when(e["type"].isin(EVENT_PARTICIPANT_TYPES), e["text"])),
                lambda x: x.isNotNull(),
            ).alias("participants"),
            F.filter(
                F.transform("ents", lambda e: F.when(e["type"] == "GPE", e["text"])),
                lambda x: x.isNotNull(),
            ).alias("locations"),
        )
        .withColumn("entity_types", F.array_distinct("entity_types_ordered"))
    )

    base = sentences.join(grouped, ["conv_id", "sentence"])

    etype, econf = _event_type_cols()
    typed = base.withColumn("event_type", etype).withColumn("confidence", econf)

    gated = (
        typed.filter(F.col("event_type") != "Other")  # EV3: OTHER 0.3 < 0.5 always
        .filter(_required_ok_col())
        .filter(F.size("participants") >= 1)
    )

    # EV6 — first date/money via the sentence metadata frame; first GPE
    # from the aligned entities.
    with_meta = gated.join(sentence_metadata, ["conv_id", "sentence"], "left").withColumn(
        "location", F.try_element_at(F.col("locations"), F.lit(1))
    )

    # EV5 — naming templates (event_extraction.py:163-198).
    p = F.col("participants")
    p0, p1 = F.try_element_at(p, F.lit(1)), F.try_element_at(p, F.lit(2))
    launch_orgs = F.filter(
        p,
        lambda x: x.contains("Inc") | x.contains("Corp") | (F.size(F.split(x, " ")) == 1),
    )
    launch_products = F.filter(
        p,
        lambda x: ~(x.contains("Inc") | x.contains("Corp") | (F.size(F.split(x, " ")) == 1)),
    )
    name = (
        F.when(
            F.col("event_type") == "Acquisition",
            F.when(F.size(p) >= 2, F.concat(p0, F.lit(" acquires "), p1)).otherwise(
                F.concat(p0, F.lit(" acquisition"))
            ),
        )
        .when(
            F.col("event_type") == "ProductLaunch",
            F.when(
                (F.size(launch_orgs) > 0) & (F.size(launch_products) > 0),
                F.concat(F.try_element_at(launch_orgs, F.lit(1)), F.lit(" launches "), F.try_element_at(launch_products, F.lit(1))),
            )
            .when(F.size(launch_products) > 0, F.concat(F.try_element_at(launch_products, F.lit(1)), F.lit(" launch")))
            .otherwise(F.concat(p0, F.lit(" product launch"))),
        )
        .when(
            F.col("event_type") == "LeadershipChange",
            F.when(F.size(p) >= 2, F.concat(p0, F.lit(" joins "), p1)).otherwise(
                F.concat(p0, F.lit(" leadership change"))
            ),
        )
        .when(F.col("event_type") == "Conference", p0)
        .when(F.col("event_type") == "FundingRound", F.concat(p0, F.lit(" funding round")))
        .otherwise(F.concat_ws(" - ", F.slice(p, 1, 2)))
    )
    named = with_meta.withColumn("name", name)

    # D2 — first-seen on (event_type, sorted participants)
    # (event_extraction.py:151-159); "first" = sentence order. The join
    # separator is a control char written as an ESCAPE so reviewers can
    # see it is non-empty (an empty separator would collide distinct
    # participant lists like ['AB'] vs ['A','B']).
    d2 = Window.partitionBy(
        "conv_id", "event_type", F.array_join(F.array_sort("participants"), "\x1f")
    ).orderBy("sent_idx")
    deduped = named.withColumn("_rn", F.row_number().over(d2)).filter(F.col("_rn") == 1)

    return deduped.select(
        F.col("conv_id").alias("document_id"),
        "event_type",
        "name",
        "participants",
        "date",
        "location",
        "amount",
        F.col("sentence").alias("context"),
        "confidence",
    )
