"""Benchmark-contamination detection: what fraction of each corpus
document's word n-grams also appear in an evaluation/benchmark set.
The standard pretraining hygiene check (e.g. GPT-3 App. C, PaLM §7)
run before training to find eval leakage in the corpus.

Scale shape: the eval side is small by construction (benchmarks are
KBs-MBs, the corpus is TBs), so its distinct gram set is broadcast —
the corpus side streams map-only through explode + broadcast-hash-join
+ partial-aggregated groupBy(doc_id). One shuffle (the per-doc count),
keyed by doc_id, which is near-uniform. No driver collect of anything
corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import ngrams_col


def _gram_col(text_col: str, n: int):
    """Word n-gram array (lowercased, whitespace-tokenized); empty array
    for blank/short texts. Mirrors textstats.repetition_stats."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    empty = F.length(F.trim(F.col(text_col))) == 0
    return F.when(empty, F.array().cast("array<string>")).otherwise(
        ngrams_col(words, n)
    )


def contamination_scores(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-corpus-document contamination against eval_docs.

    Output: (doc_id, n_grams, n_matched, contamination) where n_grams
    counts DISTINCT n-grams in the document, n_matched counts those also
    present anywhere in the eval set, and contamination = matched /
    distinct (0.0 for gram-less docs).
    """
    grams = _gram_col(text_col, n)
    corpus_g = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(grams).alias("grams"),
    )
    eval_g = (
        eval_docs.select(F.explode(_gram_col(text_col, n)).alias("gram")).distinct()
    )
    matched = (
        corpus_g.select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(eval_g), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
    )
    return (
        corpus_g.select("doc_id", F.size("grams").alias("n_grams"))
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("int").alias("n_grams"),
            F.coalesce("n_matched", F.lit(0)).cast("int").alias("n_matched"),
            F.when(F.col("n_grams") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.coalesce("n_matched", F.lit(0)) / F.col("n_grams"), 4
                )
            )
            .alias("contamination"),
        )
    )
