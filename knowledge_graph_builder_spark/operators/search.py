"""Keyword search ranking over the document corpus.

BM25 (the Lucene/Okapi formulation) expressed as pure DataFrame
aggregations: no inverted index is materialized — at query time the
token stream is filtered to the query's terms FIRST (a broadcast hash
semi-join against a handful of literals), so the per-query work is
proportional to the postings of the query terms, not the corpus. The
corpus-level statistics (N, avgdl, per-term document frequency) are
tiny aggregates that broadcast back in. At 100 TB the same plan holds:
the term filter pushes into the scan, the tf aggregation is
partial-aggregable, and nothing driver-side grows with corpus size.

Reference scope note: the reference engine has no text-search operator;
this extends the curation surface (SURVEY.md §2 addendum) the same way
the dedup/ANN families do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query terms.

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d)   = sum_t idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

    Scores are rounded to 4 decimals BEFORE the ordering so the ranking
    (and the top-k cut) is deterministic across engines and partition
    counts; ties break on doc_id. Document length and avgdl use the
    whitespace tokenization shared with the textstats operators.
    """
    terms = sorted(set(t.lower() for t in query_terms))
    toks = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    # corpus stats: doc length per doc, N and avgdl as one tiny frame.
    # dl is integer-valued so sum/avg are bit-exact across engines
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # postings of the query terms only: the isin filter is a literal
    # predicate pushed at the scan of the exploded stream
    qt = toks.filter(F.col("tok").isin(terms))
    tf = qt.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "tok")
        .join(dl, "doc_id")
        .join(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1)
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(top_k)
    )
