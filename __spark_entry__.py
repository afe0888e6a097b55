"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline; ``queries()``
exposes one callable per implemented operator family from SURVEY.md §2
(plus the corpus-pipeline operators); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible query. Non-SQL-expressible ops
(Arrow extraction kernel, MinHash/SimHash blocking, connected components)
have queries() entries only — the driver records rows-only checks there.

Column names are aligned between Spark and SQL on both sides; doubles are
rounded on both sides so cross-engine float noise cannot flip the
value-hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden transcripts + the sf documents table (each document becomes a
    single-turn conversation) -> full KG pipeline -> triples."""
    from knowledge_graph_builder_spark.plans.pipeline import run_pipeline
    from knowledge_graph_builder_spark.sources.synth import golden_transcripts

    docs = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    transcripts = golden_transcripts(spark).unionByName(docs)
    return run_pipeline(spark, transcripts).triples


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# queries — KG primitives exercised on the relational testdata + corpus ops
# ---------------------------------------------------------------------------


def _q_conv_assembly(spark, sf_dir):
    # S3: stable-ordered per-key sequence assembly (window/sort semantics)
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda s: s["event_type"],
                ),
                "|",
            ).alias("event_seq"),
            F.count("*").alias("n_events"),
        )
    )


def _q_when_chain(spark, sf_dir):
    # R1/EV1: ordered when-chain classification + aggregation
    li = _t(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_quantity") < 10, F.lit("low"))
        .when(F.col("l_quantity") < 30, F.lit("mid"))
        .otherwise(F.lit("high"))
    )
    return (
        li.withColumn("qty_band", band)
        .groupBy("qty_band", "l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


def _q_dedup_first_seen(spark, sf_dir):
    # E2/D1: first-seen-wins dedup via row_number window
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.round("o_totalprice", 2).alias("first_totalprice"),
        )
    )


def _q_pair_join(spark, sf_dir):
    # R1-R5: bounded within-group self-join (sentence-scoped pair analog)
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    a = li.select("l_orderkey", F.col("l_linenumber").alias("ln_a"))
    b = li.select("l_orderkey", F.col("l_linenumber").alias("ln_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("ln_a") < F.col("ln_b"))
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_pairs"))
    )


def _q_insights(spark, sf_dir):
    # Q1: countDistinct / avg insights
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.avg("l_discount"), 2).alias("avg_discount"),
        F.count("*").alias("n_rows"),
    )


def _q_explode_tokens(spark, sf_dir):
    # S6/EV4: explode (participants-style) + count
    p = _t(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_type", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


def _q_validation_join(spark, sf_dir):
    # V2: semi-join validation (endpoint-must-exist semantics)
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        o.join(F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"))), "o_custkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


def _q_topk_window(spark, sf_dir):
    # Q3/top-k: per-group top 3 by value
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rk")
    )


def _q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


def _q_tpch_q3(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-03-15")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def _q_dedup_exact(spark, sf_dir):
    from knowledge_graph_builder_spark.operators.dedup import exact_duplicates

    d = _t(spark, sf_dir, "documents")
    groups = exact_duplicates(d, "doc_id", "text")
    return groups.select(
        "fingerprint",
        "n_docs",
        F.array_join(F.transform("doc_ids", lambda x: x.cast("string")), ",").alias("doc_ids"),
    )


def _q_text_stats(spark, sf_dir):
    from knowledge_graph_builder_spark.operators import textstats as ts

    d = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        ts.token_count_col(c).alias("n_tokens"),
        ts.bpe_ish_token_count_col(c).alias("n_bpe_tokens"),
        F.regexp_count(c, F.lit(r"[^\w\s]")).alias("n_punct"),
        ts.fingerprint_col(c).alias("fingerprint"),
    )


def _q_lang_markers(spark, sf_dir):
    from knowledge_graph_builder_spark.operators.textstats import marker_hits_col

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        marker_hits_col(F.col("text"), "en").alias("en_hits"),
        marker_hits_col(F.col("text"), "de").alias("de_hits"),
    )


def _q_ann_topk(spark, sf_dir):
    from knowledge_graph_builder_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 1).select("embedding").collect()[0][0]
    top = brute_force_topk(e, [float(x) for x in qvec], k=10)
    return top.select("vec_id", F.round("cosine", 4).alias("cosine"))


# --- rows-only queries (no SQL oracle: kernel/iterative/LSH internals) ---


def _q_kg_triples(spark, sf_dir):
    from knowledge_graph_builder_spark.plans.pipeline import run_pipeline
    from knowledge_graph_builder_spark.sources.synth import golden_transcripts

    return run_pipeline(spark, golden_transcripts(spark)).triples


def _q_kg_events(spark, sf_dir):
    from knowledge_graph_builder_spark.plans.pipeline import run_pipeline
    from knowledge_graph_builder_spark.sources.synth import golden_transcripts

    res = run_pipeline(spark, golden_transcripts(spark))
    return res.events.withColumn("participants", F.array_join("participants", "|"))


def _q_minhash_neardup(spark, sf_dir):
    from knowledge_graph_builder_spark.operators.dedup import minhash_near_duplicates

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(d, "doc_id", "text", k=3, threshold=0.5)
    return pairs.select("a", "b", F.round("jaccard", 4).alias("jaccard"))


def _q_simhash(spark, sf_dir):
    from knowledge_graph_builder_spark.operators.dedup import simhash_duplicates

    d = _t(spark, sf_dir, "documents")
    return simhash_duplicates(d, "doc_id", "text").select("a", "b")


def _q_knn_allpairs(spark, sf_dir):
    from knowledge_graph_builder_spark.operators.similarity import all_pairs_topk

    e = _t(spark, sf_dir, "embeddings").limit(200)
    return all_pairs_topk(e, k=3).select("a", "b", F.round("cosine", 4).alias("cosine"), "rank")


def _q_canonicalize(spark, sf_dir):
    from knowledge_graph_builder_spark.operators.canonicalize import canonicalize_nodes
    from knowledge_graph_builder_spark.plans.pipeline import run_pipeline
    from knowledge_graph_builder_spark.sources.synth import golden_transcripts

    nodes = run_pipeline(spark, golden_transcripts(spark)).nodes
    return canonicalize_nodes(nodes).select("name", "type", "canonical_id")


def _q_doc_quality(spark, sf_dir):
    from knowledge_graph_builder_spark.operators.textstats import document_stats

    return document_stats(_t(spark, sf_dir, "documents"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "conv_assembly": _q_conv_assembly,
        "when_chain_classify": _q_when_chain,
        "dedup_first_seen": _q_dedup_first_seen,
        "pair_join_bounded": _q_pair_join,
        "insights_agg": _q_insights,
        "explode_tokens": _q_explode_tokens,
        "validation_join": _q_validation_join,
        "topk_window": _q_topk_window,
        "tpch_q1": _q_tpch_q1,
        "tpch_q3_top10": _q_tpch_q3,
        "dedup_exact": _q_dedup_exact,
        "text_stats": _q_text_stats,
        "lang_markers": _q_lang_markers,
        "ann_topk": _q_ann_topk,
        # rows-only (no SQL-expressible oracle):
        "kg_triples": _q_kg_triples,
        "kg_events": _q_kg_events,
        "minhash_neardup": _q_minhash_neardup,
        "simhash_bands": _q_simhash,
        "knn_allpairs": _q_knn_allpairs,
        "canonicalize": _q_canonicalize,
        "doc_quality": _q_doc_quality,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "conv_assembly": """
            SELECT user_id,
                   string_agg(event_type, '|' ORDER BY ts, event_id) AS event_seq,
                   count(*) AS n_events
            FROM events GROUP BY user_id
        """,
        "when_chain_classify": """
            SELECT CASE WHEN l_quantity < 10 THEN 'low'
                        WHEN l_quantity < 30 THEN 'mid'
                        ELSE 'high' END AS qty_band,
                   l_returnflag,
                   count(*) AS n,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem GROUP BY 1, 2
        """,
        "dedup_first_seen": """
            SELECT o_custkey,
                   o_orderkey AS first_orderkey,
                   round(o_totalprice, 2) AS first_totalprice
            FROM orders
            QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
        """,
        "pair_join_bounded": """
            SELECT a.l_orderkey, count(*) AS n_pairs
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
            GROUP BY a.l_orderkey
        """,
        "insights_agg": """
            SELECT l_returnflag,
                   count(DISTINCT l_orderkey) AS n_orders,
                   round(avg(l_discount), 2) AS avg_discount,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag
        """,
        "explode_tokens": """
            SELECT token, count(*) AS n
            FROM (SELECT unnest(string_split(p_type, ' ')) AS token FROM part)
            GROUP BY token
        """,
        "validation_join": """
            SELECT o_orderpriority, count(*) AS n
            FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
            GROUP BY o_orderpriority
        """,
        "topk_window": """
            SELECT o_orderpriority, o_orderkey,
                   round(o_totalprice, 2) AS totalprice,
                   (row_number() OVER (PARTITION BY o_orderpriority
                                       ORDER BY o_totalprice DESC, o_orderkey))::INT AS rk
            FROM orders
            QUALIFY rk <= 3
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 2) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3_top10": """
            SELECT l.l_orderkey,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
              AND l.l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
            GROUP BY l.l_orderkey
            ORDER BY revenue DESC, l.l_orderkey
            LIMIT 10
        """,
        "dedup_exact": """
            WITH fp AS (
              SELECT doc_id,
                     md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                                             '\\s+', ' ', 'g'))) AS fingerprint
              FROM documents
            )
            SELECT fingerprint,
                   count(*) AS n_docs,
                   string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS doc_ids
            FROM fp GROUP BY fingerprint HAVING count(*) >= 2
        """,
        "text_stats": """
            SELECT doc_id,
                   (CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END)::INT AS n_tokens,
                   array_length(regexp_extract_all(text, '[A-Za-z]+|\\d|[^A-Za-z\\d\\s]'))::INT AS n_bpe_tokens,
                   array_length(regexp_extract_all(text, '[^\\w\\s]'))::INT AS n_punct,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "lang_markers": """
            SELECT doc_id,
                   (
                     (length(pad) - length(replace(pad, ' the ', ''))) / 5
                   + (length(pad) - length(replace(pad, ' and ', ''))) / 5
                   + (length(pad) - length(replace(pad, ' of ', ''))) / 4
                   + (length(pad) - length(replace(pad, ' to ', ''))) / 4
                   + (length(pad) - length(replace(pad, ' is ', ''))) / 4
                   )::INT AS en_hits,
                   (
                     (length(pad) - length(replace(pad, ' der ', ''))) / 5
                   + (length(pad) - length(replace(pad, ' die ', ''))) / 5
                   + (length(pad) - length(replace(pad, ' und ', ''))) / 5
                   + (length(pad) - length(replace(pad, ' ist ', ''))) / 5
                   + (length(pad) - length(replace(pad, ' nicht ', ''))) / 7
                   )::INT AS de_hits
            FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS pad FROM documents)
        """,
        "ann_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 1)
            SELECT vec_id,
                   round(
                     list_dot_product(embedding::DOUBLE[], (SELECT qe FROM q))
                     / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                        * (SELECT sqrt(list_dot_product(qe, qe)) FROM q)),
                     4) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id
            LIMIT 10
        """,
    }
