"""SparkSession factory with the scale-oriented defaults the pipeline
assumes: AQE (with skew-join splitting), Arrow transfer for the extraction
kernel, and shuffle partitions sized to the local core count.

On a real cluster the same settings apply; only master/memory change
(driven by spark-submit). Nothing here is local-mode-specific logic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "knowledge_graph_builder_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # The zero-shuffle pipeline (extract_from_transcripts
        # assume_clustered=True) depends on Spark honoring the bucketed
        # layout of the transcripts table. Spark 4.x's
        # DisableUnnecessaryBucketedScan rule demotes a bucketed scan when
        # no downstream operator *requires* the distribution — which is
        # exactly our case, because the kernel consumes co-location as a
        # data-layout precondition invisible to the planner. A demoted scan
        # re-splits files by size and silently breaks conversation
        # co-location at production file sizes, so the optimization must
        # stay off for every session that reads bucketed transcripts.
        .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def health_check(spark: SparkSession) -> dict:
    """Q4 — connectivity probe (reference main.py:47-62): one trivial job
    proves the session schedules and executes."""
    n = spark.range(1).count()
    return {
        "status": "healthy" if n == 1 else "unhealthy",
        "spark_version": spark.version,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }
