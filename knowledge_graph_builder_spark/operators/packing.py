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


def shard_assign(
    docs: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    salt: str = "kgb",
) -> DataFrame:
    """Deterministic training-shard assignment: shard = the first 32
    bits of md5('<doc_id>:<salt>') mod n_shards. Unlike hash-partition
    numbers, the md5 bucket is a portable row-level fact (same shard in
    every engine and on every run), so shard manifests are reproducible
    and a resumed run appends to exactly the same shards.

    Scale shape: pure column math fused into the scan — the actual
    write is `df.repartition(n_shards, "shard").write.partitionBy("shard")`,
    one shuffle keyed by the (uniform, salt-balanced) shard id.
    """
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, 8),
        16, 10,
    ).cast("long")
    return docs.withColumn("shard", F.pmod(bucket, F.lit(n_shards)).cast("int"))


def shard_manifest(
    sharded: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-shard manifest (n_docs, n_chars, n_tokens) — the sidecar a
    100 TB shard writer emits for loader-side balancing checks. One
    partial-aggregable groupBy; char/token sums shuffle as scalars."""
    return sharded.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(F.col(text_col))).alias("n_chars"),
        F.sum(token_count_col(F.col(text_col))).alias("n_tokens"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split each document into overlapping fixed-width character windows
    — the context-window chunking step of a retrieval/training pipeline
    (chunk i starts at i*(chunk_chars - overlap); the final chunk may be
    short). Emits (id, chunk_idx, chunk_start, chunk_text); empty/NULL
    documents produce no chunks.

    Map-only: chunk starts come from ``sequence`` + ``posexplode`` and
    each chunk is a ``substring`` of the source row — no shuffle, no UDF,
    and the fan-out is bounded by len/stride per row, so a long document
    amplifies its own partition only (cap upstream with the pipeline's
    document length cap, not here).
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    t = F.col(text_col)
    starts = F.sequence(F.lit(0), F.length(t) - 1, F.lit(stride))
    exploded = docs.filter(t.isNotNull() & (F.length(t) > 0)).select(
        F.col(id_col),
        t.alias("_text"),
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        "chunk_start",
        F.col("_text").substr(F.col("chunk_start") + 1, F.lit(chunk_chars)).alias("chunk_text"),
    )


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    divisor: int = 64,
) -> DataFrame:
    """Content-defined chunking (FastCDC/LBFS-style): chunk boundaries
    fall where a rolling content hash of the trailing ``window`` chars
    hits 0 mod ``divisor`` — so an insertion or deletion only reshapes
    the chunks AROUND the edit instead of shifting every downstream
    fixed-width chunk (the property that makes chunk-level dedup work
    across near-identical documents; expected chunk length ≈ divisor).

    Emits (id, chunk_idx, chunk_start, chunk_text, chunk_hash). Map-only
    and fully JVM-side: boundary candidates come from a per-row
    ``filter`` over position indices (each probes one fixed-``window``
    substring — O(len·window) per row, no per-row Python), and chunks
    are ``zip_with`` slices between consecutive boundaries. The hash is
    md5-derived (engine-portable, so the DuckDB oracle replays the exact
    boundary rule). Documents shorter than ``window`` are one chunk.

    Production knobs deliberately NOT implemented here: min/max chunk
    clamps (FastCDC's normalization) make the boundary rule stateful in
    the scan position; at that point the kernel moves to ``mapInArrow``.
    """
    t = F.col(text_col)
    length = F.length(t)
    empty_b = F.array().cast("array<int>")
    probe = lambda i: (
        F.conv(F.substring(F.md5(t.substr(i - window + 1, F.lit(window))), 1, 8), 16, 10)
        .cast("long") % divisor == 0
    )
    bounds = F.when(length < window, empty_b).otherwise(
        F.filter(F.sequence(F.lit(window), length), probe).cast("array<int>")
    )
    one = F.lit(1).cast("int")
    starts = F.concat(F.array(one), F.transform(bounds, lambda b: b + one))
    ends = F.concat(bounds, F.array(length.cast("int")))
    chunks = F.zip_with(starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e")))
    exploded = (
        docs.filter(t.isNotNull() & (length > 0))
        .select(F.col(id_col), t.alias("_text"), F.posexplode(chunks).alias("chunk_idx", "c"))
        # a boundary exactly at the end of the text yields a trailing
        # empty (s > e) pseudo-chunk — drop it
        .filter(F.col("c.e") >= F.col("c.s"))
    )
    chunk_text = F.col("_text").substr(F.col("c.s"), F.col("c.e") - F.col("c.s") + one)
    return exploded.select(
        id_col,
        "chunk_idx",
        (F.col("c.s") - 1).alias("chunk_start"),
        chunk_text.alias("chunk_text"),
        F.md5(chunk_text).alias("chunk_hash"),
    )
