"""Explicit StructType schemas for every table and intermediate frame.

The reference fixed its record shapes with Pydantic (models.py); here the
same shapes are declared as Spark schemas so every scan, Arrow kernel, and
sink is schema-asserted rather than inferred (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input: Iceberg/parquet transcripts table (BASELINE.json input_hint).
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Assembled conversations: one row per conv, stable-ordered concatenation.
DOCUMENTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("doc_text", T.StringType(), True),
        T.StructField("n_turns", T.IntegerType(), True),
    ]
)

# Output of the one-pass extraction kernel. Two row kinds share the frame:
#   kind='mention': text/label/start_char/end_char set, obj/svo_ord null
#   kind='svo':     text=subject, label=verb lemma, obj=object, svo_ord set
KERNEL_ROWS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("sent_idx", T.IntegerType(), False),
        T.StructField("sentence", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("label", T.StringType(), True),
        T.StructField("obj", T.StringType(), True),
        T.StructField("svo_ord", T.IntegerType(), True),
        T.StructField("start_char", T.IntegerType(), True),
        T.StructField("end_char", T.IntegerType(), True),
    ]
)

# Entities after correction/normalization/dedup/whitelist (reference
# models.py:18-27 Entity, minus the never-populated properties struct).
ENTITIES = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("start_char", T.IntegerType(), True),
        T.StructField("end_char", T.IntegerType(), True),
        T.StructField("context", T.StringType(), True),
        T.StructField("source_sentence", T.StringType(), True),
        T.StructField("is_forced", T.BooleanType(), True),
    ]
)

# Validated relationship triples (reference models.py:29-38; the metadata
# dict only ever carries 'date'/'amount', flattened to columns).
TRIPLES = T.StructType(
    [
        T.StructField("document_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("target", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("reason", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), False),
        T.StructField("verb", T.StringType(), True),
        T.StructField("source_sentence", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("amount", T.StringType(), True),
    ]
)

# Events (reference models.py:49-59).
EVENTS = T.StructType(
    [
        T.StructField("document_id", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("participants", T.ArrayType(T.StringType()), False),
        T.StructField("date", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("amount", T.StringType(), True),
        T.StructField("context", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), False),
    ]
)

# Graph tables (reference graph_db.py:74-145; FIXTURES.md §4).
NODES = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("document_id", T.StringType(), True),
        T.StructField("source_sentence", T.StringType(), True),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("reason", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("verb", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("amount", T.StringType(), True),
        T.StructField("source_sentence", T.StringType(), True),
        T.StructField("document_id", T.StringType(), True),
        T.StructField("session_id", T.StringType(), True),
    ]
)

# Checkpoint/resume lineage manifest (FIXTURES.md §4, north_rule).
LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("input_rows", T.LongType(), True),
        T.StructField("output_rows", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)
