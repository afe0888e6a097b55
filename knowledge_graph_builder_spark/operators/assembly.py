"""S3 — conversation assembly (SURVEY.md §2.1).

The reference processed one request body as one document (main.py:75-80).
Here a document is a conversation: turns joined in stable
``(conv_id, turn_idx)`` order. The per-row invariant from the graft spec —
per-turn text equality under stable turn ordering — demands the result be
byte-identical no matter how the rows are partitioned or ordered on disk,
which is why the declarative path sorts an aggregated array
(`sort_array(collect_list(struct(...)))`) instead of relying on any input
ordering.

Scale notes (10^12 turns):
* One shuffle, keyed by conv_id. AQE coalesces small post-shuffle
  partitions; hot conversations are bounded by the 2M-char document guard
  (reference nlp_engine.py:20), so a single group's state is capped.
* For the fused scale path that avoids materializing documents at all,
  see operators/extraction.py::extract_from_transcripts (repartition +
  sortWithinPartitions + one mapInPandas pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rules import MAX_TEXT_LENGTH

# Turn texts are joined with a single space: the reference's clean_text
# (nlp_engine.py:22-27) collapses any whitespace run to one space anyway,
# so this choice is canonical under the cleaning that follows.
TURN_SEPARATOR = " "


def assemble_conversations(transcripts: DataFrame, max_length: int = MAX_TEXT_LENGTH) -> DataFrame:
    """transcripts(conv_id, turn_idx, text, ...) -> documents(conv_id, doc_text, n_turns).

    Deterministic under arbitrary row order: collect_list is
    order-nondeterministic, so the struct array is sorted on turn_idx
    before joining. Ties on turn_idx (malformed input) break on text to
    stay deterministic.
    """
    return (
        # malformed-row contract (shared with the fused kernel): NULL
        # conv_id rows are dropped, NULL turn_idx sorts first as -1
        transcripts.select(
            "conv_id", F.coalesce("turn_idx", F.lit(-1)).alias("turn_idx"), "text"
        )
        .filter(F.col("conv_id").isNotNull())
        .groupBy("conv_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("turn_idx", "text"))).alias("turns"),
            F.count("*").cast("int").alias("n_turns"),
        )
        .select(
            "conv_id",
            F.substring(
                F.array_join(F.transform("turns", lambda t: t["text"]), TURN_SEPARATOR),
                1,
                max_length,
            ).alias("doc_text"),
            "n_turns",
        )
    )
