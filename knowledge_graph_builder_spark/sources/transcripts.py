"""Transcript source (reference S1/S2 equivalent — SURVEY.md §2.1).

The reference ingested one HTTP request body per document (main.py:64-75).
Here the source is an Iceberg table of transcripts when an Iceberg catalog
is configured, else a parquet directory with the identical layout; either
way `conv_id` plays the reference's `document_id`.

Filters and column selection applied downstream reach the scan (predicate
pushdown / column pruning); partition pruning applies when the table is
written bucketed/partitioned by conv_id hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import TRANSCRIPTS


def read_transcripts(spark: SparkSession, source: str, fmt: str | None = None) -> DataFrame:
    """Read the transcripts table.

    ``source`` may be an Iceberg table identifier (``catalog.db.table``,
    used when the session has an Iceberg catalog) or a path; ``fmt``
    selects ``parquet`` (default for paths), ``json`` (JSON-lines), or
    ``csv`` (with header). All formats are schema-asserted — inference is
    never used (SURVEY.md §1.3).
    """
    if fmt is None and "/" not in source and "." in source:
        try:
            return spark.read.format("iceberg").load(source)
        except Exception as exc:
            # fall back ONLY when the Iceberg data source itself is
            # absent; real table errors (permissions, corrupt metadata)
            # must surface, not turn into a confusing parquet-path error
            msg = str(exc)
            if "DATA_SOURCE_NOT_FOUND" not in msg and "Failed to find" not in msg:
                raise
    if fmt is None and source.rstrip("/").endswith((".jsonl", ".json")):
        fmt = "json"
    if fmt is None and source.rstrip("/").endswith(".csv"):
        fmt = "csv"
    reader = spark.read.schema(TRANSCRIPTS)
    if fmt == "json":
        return reader.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]").json(source)
    if fmt == "csv":
        return reader.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]"
        ).csv(source)
    return reader.parquet(source)


def write_transcripts(df: DataFrame, path: str, buckets: int = 0) -> None:
    """Write transcripts partition-friendly: clustered by conv_id so the
    assembly shuffle is cheap (and prunable when bucketing is available)."""
    writer = df.repartition("conv_id").sortWithinPartitions("conv_id", "turn_idx").write.mode("overwrite")
    writer.parquet(path)


def write_transcripts_bucketed(df: DataFrame, table: str, buckets: int = 64) -> None:
    """Land the transcripts table HASH-BUCKETED by conv_id (Spark SQL
    bucketing via saveAsTable; the Iceberg equivalent is
    ``PARTITIONED BY (bucket(N, conv_id))``).

    This is the SCALE.md §1 input layout: a bucketed read materializes
    each bucket as exactly ONE partition with every conversation's turns
    co-located, so the extraction kernel can run with
    ``assume_clustered=True`` — zero shuffles end to end (the write pays
    the clustering cost once; every subsequent extraction run over the
    table skips it). Size ``buckets`` to ~3 GB of input each (2^15 at
    100 TB)."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .format("parquet")
        .saveAsTable(table)
    )
