"""Sequence packing for training-data pipelines: assign documents to
fixed-token-budget bins (the pretraining "sample packing" step that turns
a ragged corpus into uniform training sequences).

Greedy first-fit packing is inherently sequential, so the distributed
form is contiguous-fill WITHIN SHARDS: documents are deterministically
sharded, ordered inside each shard, and a running token total assigns
each document a bin = floor(preceding_tokens / max_tokens) and an offset
inside that bin. Every step is a column expression or a PER-SHARD window
— no corpus-global sort, no driver loop — and the whole computation is
ANSI-SQL-expressible, so the driver holds it to a DuckDB value oracle.

Scale shape: the only window partitions by shard; choose n_shards ~
(corpus tokens / executor-memory budget) so per-shard state is bounded.
Packing quality: contiguous fill wastes at most one document's tokens
per bin boundary (documents straddle boundaries, as in standard
pretraining packing where sequences are later split/truncated at the
token level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count_col


def pack_documents(
    docs: DataFrame,
    max_tokens: int = 2048,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs -> (shard, bin, doc_id, n_tokens, bin_offset).

    ``shard = doc_id % n_shards`` (portable + deterministic), documents
    ordered by id within the shard; ``bin_offset`` is where the document
    starts inside its bin's token budget.
    """
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count_col(F.col(text_col)).alias("n_tokens"),
    ).withColumn("shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int"))
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        "shard",
        F.floor(before / max_tokens).cast("bigint").alias("bin"),
        "doc_id",
        "n_tokens",
        F.pmod(before, F.lit(max_tokens)).cast("bigint").alias("bin_offset"),
    )


def pack_stats(packed: DataFrame, max_tokens: int = 2048) -> DataFrame:
    """Per-(shard, bin) packing summary: docs packed, tokens filled, and
    fill ratio against the budget — the packing-efficiency monitor."""
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.round(F.sum("n_tokens") / F.lit(max_tokens), 4).alias("fill_ratio"),
    )
