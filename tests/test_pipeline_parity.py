"""The single-shuffle fused pipeline (kernel emits finished per-document
entities/triples/events) must be byte-identical to the relational operator
composition (fused=False: entity_stage -> candidate self-joins -> D1 window
-> V2 validation joins -> relational events). The fused path is how the
engine runs at scale; the relational path is the semantics oracle."""

from __future__ import annotations

from collections import Counter

from knowledge_graph_builder_spark.plans.pipeline import run_pipeline
from knowledge_graph_builder_spark.sources.synth import golden_transcripts, synth_transcripts


def _ms(df, cols):
    return Counter(
        tuple(
            tuple(v) if isinstance(v, list) else (round(v, 9) if isinstance(v, float) else v)
            for v in row
        )
        for row in df.select(*cols).collect()
    )


ENT_COLS = ["conv_id", "text", "type", "start_char", "end_char", "context", "source_sentence", "is_forced"]
TRI_COLS = ["document_id", "source", "target", "type", "reason", "confidence", "verb", "source_sentence", "date", "amount"]
EV_COLS = ["document_id", "event_type", "name", "participants", "date", "location", "amount", "context", "confidence"]


def _assert_equal(spark, transcripts):
    fused = run_pipeline(spark, transcripts, fused=True, persist=False)
    rel = run_pipeline(spark, transcripts, fused=False, persist=False)
    for cols, f, r, what in (
        (ENT_COLS, fused.entities, rel.entities, "entities"),
        (TRI_COLS, fused.triples, rel.triples, "triples"),
        (EV_COLS, fused.events, rel.events, "events"),
    ):
        mf, mr = _ms(f, cols), _ms(r, cols)
        assert mf == mr, (
            f"{what}: only-fused={list((mf - mr).keys())[:3]} only-relational={list((mr - mf).keys())[:3]}"
        )
        assert sum(mf.values()) > 0 or what == "events"


def test_pipeline_parity_golden(spark):
    _assert_equal(spark, golden_transcripts(spark))


def test_pipeline_parity_synth(spark):
    _assert_equal(spark, synth_transcripts(spark, n_convs=40, seed=11))
