"""Checkpoint/resume semantics (north_rule: resumable from checkpoint with
per-partition lineage + metrics): a stage directory is reused iff its
parquet commit succeeded AND its manifest row landed (write-then-commit
order), so a killed run recomputes exactly the unfinished stages and the
resumed output is identical."""

from __future__ import annotations

import json
import os
import shutil

from knowledge_graph_builder_spark.plans.pipeline import run_pipeline
from knowledge_graph_builder_spark.sources.synth import golden_transcripts


def _triples(res):
    return sorted(tuple(r) for r in res.triples.select("document_id", "source", "type", "target").collect())


def test_resume_reuses_completed_stages(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    tr = golden_transcripts(spark)

    r1 = run_pipeline(spark, tr, checkpoint_dir=ckpt, run_id="r1")
    base = _triples(r1)
    from knowledge_graph_builder_spark.sources.synth import GOLDEN_EXPECTED_TRIPLES

    assert len(base) == len(GOLDEN_EXPECTED_TRIPLES)
    stages = {row["stage"] for row in r1.lineage}
    assert {"kernel_rows", "entities", "triples", "events"} <= stages
    assert all(not row.get("resumed") for row in r1.lineage)

    # full re-run with the same run id: everything loads from checkpoint
    r2 = run_pipeline(spark, tr, checkpoint_dir=ckpt, run_id="r1")
    assert all(row.get("resumed") for row in r2.lineage)
    assert _triples(r2) == base


def test_crash_between_write_and_commit_recomputes(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    tr = golden_transcripts(spark)
    r1 = run_pipeline(spark, tr, checkpoint_dir=ckpt, run_id="r1")
    base = _triples(r1)

    # simulate a crash AFTER the triples parquet write but BEFORE its
    # manifest commit: drop the manifest rows for triples+events (the
    # stage dirs remain, possibly partial — they must NOT be trusted)
    mpath = os.path.join(ckpt, "manifest.jsonl")
    rows = [json.loads(l) for l in open(mpath)]
    kept = [r for r in rows if r["stage"] in ("kernel_rows", "entities")]
    with open(mpath, "w") as fh:
        for r in kept:
            fh.write(json.dumps(r) + "\n")
    shutil.rmtree(os.path.join(ckpt, "triples"))

    r2 = run_pipeline(spark, tr, checkpoint_dir=ckpt, run_id="r1")
    by_stage = {row["stage"]: row for row in r2.lineage}
    assert by_stage["kernel_rows"].get("resumed") and by_stage["entities"].get("resumed")
    assert not by_stage["triples"].get("resumed")
    assert _triples(r2) == base


def test_new_run_id_recomputes_everything(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt3")
    tr = golden_transcripts(spark)
    run_pipeline(spark, tr, checkpoint_dir=ckpt, run_id="r1")
    r2 = run_pipeline(spark, tr, checkpoint_dir=ckpt, run_id="r2")
    assert all(not row.get("resumed") for row in r2.lineage)


def test_different_input_same_run_id_recomputes(spark, tmp_path):
    """Resume safety: the same run_id pointed at DIFFERENT input must not
    silently return the previous run's cached stages."""
    ckpt = str(tmp_path / "ckpt4")
    a = golden_transcripts(spark).filter("conv_id <= 'g5'")
    b = golden_transcripts(spark)  # superset — different source plan
    r1 = run_pipeline(spark, a, checkpoint_dir=ckpt, run_id="r1")
    n1 = len(_triples(r1))
    r2 = run_pipeline(spark, b, checkpoint_dir=ckpt, run_id="r1")
    assert all(not row.get("resumed") for row in r2.lineage)
    assert len(_triples(r2)) > n1
