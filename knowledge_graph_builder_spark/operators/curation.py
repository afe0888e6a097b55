"""End-to-end corpus curation: the composed pretraining-data filter
chain (quality gates -> exact dedup -> stratified sampling) with
per-document disposition lineage — every document gets a `decision`
naming the FIRST stage that dropped it, or 'kept'. The lineage column
is what makes a 100 TB curation run auditable: `groupBy(decision)`
is the curation funnel report, and any doc's fate is explainable
without re-running the pipeline.

Scale shape: quality gates and the sampling draw are per-row column
math (fused into the scan); the text column is digested to a 32-char
fingerprint IN the scan projection, so the exact-dedup canonical
survivor is a window-min over fp on narrow derived rows — ONE scan of
the corpus and ONE shuffle of ~60 B/doc rows, never a second pass
over the text bytes (a groupBy+join formulation plans two full scans
because DataFrame lineage is duplicated, measured via .explain).
Identical-boilerplate hot fps co-locate their (narrow) rows on one
reducer for a scalar min — bounded by docs-per-fp, not text size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalize_text_col
from .sampling import _threshold_hex, sample_bucket_col
from .textstats import token_count_col


def _rep_ratio_col(text_col: str, n: int = 3):
    """Duplicate word-n-gram fraction (mirrors textstats.repetition_stats)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    empty = F.length(F.trim(F.col(text_col))) == 0
    grams = F.when(
        empty | (F.size(words) < n), F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
    )
    n_grams = F.size(grams)
    return F.when(n_grams == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(grams)) / n_grams
    )


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = 5,
    max_rep_ratio: float = 0.3,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "kgb",
) -> DataFrame:
    """Per-document curation disposition.

    Output: (doc_id, lang, n_tokens, decision) with decision in
    ('too_short', 'repetitive', 'duplicate', 'sampled_out', 'kept'),
    the first applicable in that order. Duplicate = another doc with
    the same normalized text has a smaller id (first-seen survives,
    and the survivor is judged by the later stages like any other doc).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(strata_col).alias("lang"),
        token_count_col(F.col(text_col)).cast("int").alias("n_tokens"),
        _rep_ratio_col(text_col).alias("rep_ratio"),
        F.md5(normalize_text_col(F.col(text_col))).alias("fp"),
        sample_bucket_col(id_col, salt).alias("bucket"),
    )
    rate_chain = None
    for stratum, rate in sorted((rates or {}).items()):
        th = F.lit(_threshold_hex(rate))
        cond = F.col("lang") == stratum
        rate_chain = (
            F.when(cond, th) if rate_chain is None else rate_chain.when(cond, th)
        )
    threshold = (
        rate_chain.otherwise(F.lit(_threshold_hex(default_rate)))
        if rate_chain is not None
        else F.lit(_threshold_hex(default_rate))
    )

    return (
        base.withColumn("canon_id", F.min("doc_id").over(Window.partitionBy("fp")))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
            .when(F.col("rep_ratio") > max_rep_ratio, F.lit("repetitive"))
            .when(F.col("doc_id") != F.col("canon_id"), F.lit("duplicate"))
            .when(F.col("bucket") >= threshold, F.lit("sampled_out"))
            .otherwise(F.lit("kept"))
            .alias("decision"),
        )
    )


def curation_funnel(decisions: DataFrame) -> DataFrame:
    """Aggregate curation report: docs per decision."""
    return decisions.groupBy("decision").agg(F.count("*").alias("n_docs"))
