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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed tf-idf
    (the sklearn formulation: idf = ln((1+N)/(1+df)) + 1).

    The per-document keyword profile used for corpus exploration and
    cluster labeling. Scores are rounded to 4 decimals BEFORE ranking
    so the cut is deterministic across engines/partitionings; ties
    break on the term itself.

    Scale shape: ONE corpus scan — tf is a partial-aggregable groupBy
    over the exploded token stream, and df comes from a count-window
    over the narrow tf frame keyed by the term (a groupBy + self-join
    formulation duplicates the DataFrame lineage and scans the corpus
    twice; the window shuffles the ~30 B/term rows once instead). The
    corpus document count broadcasts from a column-pruned count of the
    id column (``id_col`` is a key, and every non-blank document has at
    least one token, so this equals the distinct-doc count of the token
    stream). The final ranking is a window per doc_id whose partition
    size is bounded by a document's distinct term count, never by
    corpus size.
    """
    toks = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    n_docs = docs.filter(F.length(F.trim(F.col(text_col))) > 0).agg(
        F.count(id_col).cast("double").alias("n_docs")
    )
    wt = Window.partitionBy("tok")
    scored = (
        tf.withColumn("df", F.count("*").over(wt))
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0),
                4,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("doc_id", F.col("tok").alias("term"), "score", F.col("rnk").cast("int").alias("rnk"))
    )


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
