"""Transcript source formats (parquet / JSON-lines / CSV) must feed the
pipeline identically, and the streaming foreachBatch checkpoint must make
restarts idempotent (a restart with the same checkpoint reprocesses
nothing; new files process exactly once)."""

from __future__ import annotations

from knowledge_graph_builder_spark.plans.pipeline import run_pipeline
from knowledge_graph_builder_spark.sources.synth import golden_transcripts
from knowledge_graph_builder_spark.sources.transcripts import read_transcripts
from knowledge_graph_builder_spark.streaming.incremental import stream_kg_foreachbatch


def _triple_set(spark, tr):
    return {
        tuple(r)
        for r in run_pipeline(spark, tr, persist=False)
        .triples.select("document_id", "source", "type", "target")
        .collect()
    }


def test_json_and_csv_sources_match_parquet(spark, tmp_path):
    tr = golden_transcripts(spark)
    base = _triple_set(spark, tr)

    pq = str(tmp_path / "t_parquet")
    tr.write.parquet(pq)
    assert _triple_set(spark, read_transcripts(spark, pq)) == base

    js = str(tmp_path / "t.jsonl")
    tr.write.json(js)
    assert _triple_set(spark, read_transcripts(spark, js, fmt="json")) == base

    cs = str(tmp_path / "t.csv")
    tr.write.option("header", "true").csv(cs)
    assert _triple_set(spark, read_transcripts(spark, cs, fmt="csv")) == base


def test_streaming_restart_is_idempotent(spark, tmp_path):
    tr = golden_transcripts(spark)
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    tr.filter("conv_id <= 'g5'").repartition(1).write.mode("append").parquet(inp)

    q1 = stream_kg_foreachbatch(spark, inp, out, ckpt, available_now=True)
    q1.awaitTermination(120)
    first = spark.read.parquet(f"{out}/triples/batch=*").count()
    assert first > 0

    # restart with the SAME checkpoint and no new data: nothing reprocessed
    q2 = stream_kg_foreachbatch(spark, inp, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out}/triples/batch=*").count() == first

    # add the remaining conversations; restart processes exactly the delta
    tr.filter("conv_id > 'g5'").repartition(1).write.mode("append").parquet(inp)
    q3 = stream_kg_foreachbatch(spark, inp, out, ckpt, available_now=True)
    q3.awaitTermination(120)
    streamed = {
        tuple(r)
        for r in spark.read.parquet(f"{out}/triples/batch=*")
        .select("document_id", "source", "type", "target")
        .collect()
    }
    assert streamed == _triple_set(spark, tr)


def test_compact_parquet_preserves_rows_and_untouched_partitions(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from knowledge_graph_builder_spark.operators.compact import (
        _data_files,
        compact_parquet,
    )

    root = str(tmp_path / "tbl")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 3).alias("part"), F.md5(F.col("id").cast("string")).alias("v")
    )
    # fragment partitions 0/1 into many tiny files; partition 2 single-file
    df.filter("part < 2").repartition(16).write.partitionBy("part").parquet(root)
    df.filter("part = 2").coalesce(1).write.mode("append").partitionBy("part").parquet(root)

    p2 = os.path.join(root, "part=2")
    sig_before = sorted(
        (os.path.basename(f), os.path.getsize(f)) for f in _data_files(p2)
    )
    before_rows = sorted(tuple(r) for r in spark.read.parquet(root).collect())

    rep = compact_parquet(spark, root, target_file_bytes=64 * 1024 * 1024)
    assert rep.partitions_seen == 3
    assert rep.partitions_compacted == 2          # part=2 already compact
    assert rep.files_after < rep.files_before
    assert len(_data_files(os.path.join(root, "part=0"))) == 1

    # untouched partition files byte-identical (same names, same sizes)
    sig_after = sorted(
        (os.path.basename(f), os.path.getsize(f)) for f in _data_files(p2)
    )
    assert sig_after == sig_before
    # value-identical table after compaction
    after_rows = sorted(tuple(r) for r in spark.read.parquet(root).collect())
    assert after_rows == before_rows
    # idempotent: second sweep is a no-op
    rep2 = compact_parquet(spark, root, target_file_bytes=64 * 1024 * 1024)
    assert rep2.partitions_compacted == 0


def test_bucketed_join_eliminates_exchange(spark, tmp_path):
    from knowledge_graph_builder_spark.sources.bucketed import (
        join_plan_exchanges,
        write_bucketed,
    )

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path}/wh'")
    try:
        nodes = spark.range(1000).selectExpr("id AS key", "md5(id::string) AS name")
        edges = spark.range(5000).selectExpr(
            "(id % 1000) AS key", "id AS edge_id"
        )
        write_bucketed(nodes, "bucketdb.b_nodes", "key", n_buckets=8)
        write_bucketed(edges, "bucketdb.b_edges", "key", n_buckets=8)
        # co-located: the equi-join on the bucket key plans ZERO shuffles
        assert join_plan_exchanges(spark, "bucketdb.b_nodes", "bucketdb.b_edges", "key") == 0
        # values are right too
        out = spark.table("bucketdb.b_nodes").join(spark.table("bucketdb.b_edges"), "key")
        assert out.count() == 5000
        # control: the same join from raw (unbucketed) frames shuffles
        nodes.createOrReplaceTempView("raw_nodes")
        edges.createOrReplaceTempView("raw_edges")
        raw = spark.table("raw_nodes").join(spark.table("raw_edges"), "key")
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in raw_plan
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_transcripts_run_kernel_shuffle_free(spark, tmp_path):
    """SCALE.md §1 input layout, now executable: transcripts landed via
    write_transcripts_bucketed read back as one-partition-per-bucket with
    conversations co-located, so extract_from_transcripts(
    assume_clustered=True) plans ZERO Exchange operators — the pipeline's
    only wide operation eliminated — while producing the identical triple
    set to the shuffling path."""
    from knowledge_graph_builder_spark.operators.extraction import (
        EMIT_GRAPH,
        extract_from_transcripts,
    )
    from knowledge_graph_builder_spark.sources.synth import golden_transcripts
    from knowledge_graph_builder_spark.sources.transcripts import (
        write_transcripts_bucketed,
    )

    spark.sql(f"CREATE DATABASE IF NOT EXISTS convdb LOCATION '{tmp_path}/wh'")
    try:
        # shuffled input order: co-location must come from the BUCKETED
        # WRITE, not from the synth source happening to be sorted
        src = golden_transcripts(spark, shuffled=True).repartition(7)
        write_transcripts_bucketed(src, "convdb.transcripts", buckets=4)
        bucketed = spark.table("convdb.transcripts")

        fast = extract_from_transcripts(bucketed, emit=EMIT_GRAPH, assume_clustered=True)
        plan = fast._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:800]
        # no-Exchange alone cannot see a DEMOTED bucketed scan (Spark 4's
        # DisableUnnecessaryBucketedScan re-splits files by size when no
        # operator requires the distribution — at production file sizes
        # that breaks conversation co-location silently). Assert the scan
        # is ACTUALLY bucketed and reads one partition per bucket; the
        # session factory pins autoBucketedScan.enabled=false to make it so.
        fmt = fast._jdf.queryExecution().explainString(
            fast.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Bucketed: true" in fmt, fmt[:1200]
        assert "disabled by query planner" not in fmt, fmt[:1200]
        assert fast.rdd.getNumPartitions() == 4

        def triples(df):
            return {
                (r.conv_id, r.text, r.label, r.reason)
                for r in df.filter(df.kind == "triple").collect()
            }

        slow = extract_from_transcripts(bucketed, emit=EMIT_GRAPH)
        assert triples(fast) == triples(slow)
        assert len(triples(fast)) > 0
    finally:
        spark.sql("DROP DATABASE IF EXISTS convdb CASCADE")
