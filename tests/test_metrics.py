"""Headline quality metric: triple precision/recall vs the reference's
extraction semantics over the golden corpus (BASELINE.json metric:
P/R >= 0.95). Both sides are deterministic rule systems, so the target is
exact agreement; the metric is computed explicitly so regressions show as
a number, not just a failed set-compare. Also pins the Q1 insights
aggregates and per-partition lineage metrics."""

from __future__ import annotations

from knowledge_graph_builder_spark.operators.graph import entity_type_histogram, insights
from knowledge_graph_builder_spark.plans.pipeline import run_pipeline
from knowledge_graph_builder_spark.sources.synth import golden_transcripts

# (conv, source, type, target) — reference semantics over the golden corpus
# (same sets test_golden_e2e.py pins per conversation). Defined next to the
# golden corpus itself so the driver-contract oracle shares it.
from knowledge_graph_builder_spark.sources.synth import GOLDEN_EXPECTED_TRIPLES as EXPECTED


def test_triple_precision_recall(spark):
    res = run_pipeline(spark, golden_transcripts(spark))
    got = {
        (r.document_id, r.source, r.type, r.target)
        for r in res.triples.collect()
    }
    tp = len(got & EXPECTED)
    precision = tp / max(len(got), 1)
    recall = tp / len(EXPECTED)
    assert precision >= 0.95, f"precision {precision:.3f} ({got - EXPECTED})"
    assert recall >= 0.95, f"recall {recall:.3f} ({EXPECTED - got})"


def test_insights_and_histogram(spark):
    res = run_pipeline(spark, golden_transcripts(spark))
    stats = insights(res.nodes, res.edges).collect()
    assert len(stats) == 1
    row = stats[0]
    assert row["session_id"] == "batch"
    assert row["total_entities"] == 27
    assert row["total_relationships"] == 34  # 28 golden triples + INVOLVES, deduped on (src, type, dst)
    assert 0.0 <= row["avg_confidence"] <= 1.0

    hist = {r["type"]: r["count"] for r in entity_type_histogram(res.nodes).collect()}
    # only the 4 observable types can appear (SURVEY.md §1.2)
    assert set(hist) <= {"PERSON", "ORG", "GPE", "PRODUCT"}
    assert hist["ORG"] >= 5 and hist["PERSON"] >= 3


def test_per_partition_lineage(spark, tmp_path):
    """Manifest rows carry only bounded aggregates; the per-file counts
    live in a parquet sidecar readable through Checkpointer.partition_rows
    (round-3 verdict: never collect ~400k per-file rows to the driver)."""
    from knowledge_graph_builder_spark.plans.pipeline import Checkpointer

    ckpt_dir = str(tmp_path / "c")
    res = run_pipeline(
        spark, golden_transcripts(spark), checkpoint_dir=ckpt_dir, run_id="r"
    )
    by_stage = {row["stage"]: row for row in res.lineage}
    ckpt = Checkpointer(ckpt_dir, "r", spark)
    for stage in ("kernel_rows", "entities", "triples", "events"):
        row = by_stage[stage]
        assert row["n_partitions"] >= 1
        assert "partition_rows" not in row  # the dict must NOT be driver-side
        side = ckpt.partition_rows(stage)
        agg = side.groupBy().sum("count").collect()[0][0]
        assert agg == row["output_rows"]
        assert side.count() == row["n_partitions"]


def test_lineage_sidecar_many_files(spark, tmp_path):
    """A stage written as thousands of files must keep its manifest row
    bounded: the JSON entry stays tiny while the sidecar carries one row
    per file (the SCALE.md ~400k-kernel-partition shape, downscaled)."""
    import json as _json
    import os

    from knowledge_graph_builder_spark.plans.pipeline import Checkpointer

    root = str(tmp_path / "many")
    ckpt = Checkpointer(root, "r", spark)
    n_files = 2000
    ckpt.stage("wide", lambda: spark.range(4 * n_files).repartition(n_files))
    row = ckpt.lineage[0]
    assert row["output_rows"] == 4 * n_files
    assert row["n_partitions"] == n_files
    # the manifest line itself is O(100 bytes), not O(n_files)
    with open(os.path.join(root, "manifest.jsonl")) as fh:
        line = fh.readline()
    assert len(line) < 1000
    assert _json.loads(line)["partition_rows_sidecar"] == "wide._lineage"
    side = ckpt.partition_rows("wide")
    assert side.count() == n_files
    assert side.groupBy().sum("count").collect()[0][0] == 4 * n_files


def test_event_set_matches_reference(spark):
    """Complete event-set agreement (EV1-EV6) — the event analog of the
    triple P/R metric, against the same shared golden constant the
    driver-contract oracle uses."""
    from knowledge_graph_builder_spark.sources.synth import GOLDEN_EXPECTED_EVENTS

    res = run_pipeline(spark, golden_transcripts(spark))
    got = {
        (r.document_id, r.event_type, r.name, "|".join(r.participants),
         r.date, r.amount, r.location, round(r.confidence, 2))
        for r in res.events.collect()
    }
    assert got == set(GOLDEN_EXPECTED_EVENTS)
