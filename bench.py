"""Benchmark harness. Runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, ...extras}

The KG-pipeline input is synthesized DISTRIBUTED (spark.range + column
expressions picking from a seeded, driver-rendered sentence pool), so the
benchmark measures the engine, not driver-side row construction. Turn
count scales with the sf directory (sf0.1 -> ~400k turns) and includes a
hot conversation (~100x median) to exercise the skew path.

Env knobs:
  SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local core count (default 32)
  KGB_BENCH_TURNS      override synthesized turn count
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_transcripts_distributed(spark: SparkSession, n_turns: int, turns_per_conv: int = 8) -> DataFrame:
    """Distributed transcript synthesis: a seeded 1024-sentence pool is
    rendered driver-side (tiny) and becomes an array literal; rows pick
    from it by hash. conv-hot gets ~100x the median turn count."""
    import random

    from knowledge_graph_builder_spark.sources.synth import _filler_sentence

    rng = random.Random(42)
    pool = [_filler_sentence(rng) for _ in range(1024)]
    pool_col = F.array(*[F.lit(s) for s in pool])
    hot_turns = min(turns_per_conv * 100, n_turns // 10)

    base = spark.range(n_turns)
    conv = (
        F.when(F.col("id") < hot_turns, F.lit("conv-hot")).otherwise(
            F.concat(F.lit("conv-"), ((F.col("id") - hot_turns) / turns_per_conv).cast("long").cast("string"))
        )
    )
    turn_idx = (
        F.when(F.col("id") < hot_turns, F.col("id")).otherwise(
            (F.col("id") - hot_turns) % turns_per_conv
        )
    ).cast("int")
    return base.select(
        conv.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.element_at(F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")), (F.col("id") % 3 + 1).cast("int")).alias("role"),
        F.element_at(pool_col, (F.pmod(F.xxhash64("id"), 1024) + 1).cast("int")).alias("text"),
        F.lit("").alias("tool"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    n_turns = int(os.environ.get("KGB_BENCH_TURNS", str(int(4_000_000 * sf))))

    from knowledge_graph_builder_spark.session import get_spark

    spark = get_spark(
        app_name="kgb-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )

    import __spark_entry__ as entrymod
    from knowledge_graph_builder_spark.operators.dedup import minhash_near_duplicates, simhash_duplicates
    from knowledge_graph_builder_spark.operators.canonicalize import canonicalize_nodes
    from knowledge_graph_builder_spark.plans.pipeline import run_pipeline

    transcripts = synth_transcripts_distributed(spark, n_turns)
    transcripts.write.mode("overwrite").parquet("/tmp/kgb_bench_transcripts")
    transcripts = spark.read.parquet("/tmp/kgb_bench_transcripts")
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")

    timings: dict[str, float] = {}
    extras: dict[str, object] = {}

    def timed(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    # headline 1: full KG pipeline (fused single-shuffle path), turns/sec
    res = run_pipeline(spark, transcripts, kernel_partitions=max(cpus * 2, 16))
    n_triples = timed("kg_pipeline", lambda: res.triples.count())
    extras["n_turns"] = n_turns
    extras["n_triples"] = n_triples
    extras["turns_per_sec"] = round(n_turns / timings["kg_pipeline"], 1)

    # headline 2: graph materialize + canonicalization loop
    timed("kg_graph_nodes", lambda: res.nodes.count())
    timed("canonicalize", lambda: canonicalize_nodes(res.nodes).select("canonical_id").distinct().count())

    # headline 3: corpus dedup + similarity + analytics
    timed("minhash_neardup", lambda: minhash_near_duplicates(documents, "doc_id", "text", threshold=0.5).count())
    timed("simhash_bands", lambda: simhash_duplicates(documents, "doc_id", "text").count())
    timed("ann_topk", lambda: entrymod._q_ann_topk(spark, sf_dir).collect())
    timed("tpch_q1", lambda: entrymod._q_tpch_q1(spark, sf_dir).collect())
    timed("conv_assembly", lambda: entrymod._q_conv_assembly(spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "kg_batch_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
