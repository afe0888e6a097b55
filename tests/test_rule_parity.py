"""The kernel's sentence-local rule candidates (textkit.extract_rule_candidates,
emitted as kind='cand' rows) must be row-for-row identical to the relational
formulation (operators/relationships.candidate_relationships — per-sentence
self-joins + Catalyst when-chains). The pipeline uses the kernel path for
speed; this parity pin keeps the documented relational operators honest.
"""

from __future__ import annotations

from collections import Counter

from knowledge_graph_builder_spark.operators.extraction import extract_from_transcripts
from knowledge_graph_builder_spark.operators.relationships import (
    candidate_relationships,
    candidates_from_kernel,
)
from knowledge_graph_builder_spark.sources.synth import golden_transcripts, synth_transcripts

_COLS = [
    "conv_id", "sent_idx", "source", "target", "type", "reason",
    "confidence", "verb", "strat_group", "rule_pri", "ord_a", "ord_b", "attach_metadata",
]


def _multiset(df):
    return Counter(
        tuple(round(v, 9) if isinstance(v, float) else v for v in row)
        for row in df.select(*_COLS).collect()
    )


def _assert_parity(spark, transcripts):
    kr = extract_from_transcripts(transcripts, 4)
    kernel_side = _multiset(candidates_from_kernel(kr))
    relational_side = _multiset(candidate_relationships(kr, persist=False))
    missing = relational_side - kernel_side
    extra = kernel_side - relational_side
    assert not missing and not extra, (
        f"missing from kernel path: {list(missing)[:5]}; extra: {list(extra)[:5]}"
    )
    assert sum(kernel_side.values()) > 0


def test_candidates_parity_golden(spark):
    _assert_parity(spark, golden_transcripts(spark))


def test_candidates_parity_synth(spark):
    _assert_parity(spark, synth_transcripts(spark, n_convs=60, seed=7))
