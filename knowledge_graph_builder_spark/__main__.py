"""spark-submit entry point.

    spark-submit --py-files kgb.zip -m knowledge_graph_builder_spark \
        --input  /data/transcripts \
        --output /data/kg \
        --checkpoint /data/kg/_checkpoints \
        --session-id batch-2026-08-16 \
        --partitions 4096

Reads the transcripts table (Iceberg identifier via --table, else parquet
path via --input), runs the fused single-shuffle pipeline, and writes the
nodes/edges/triples/events tables partitioned for downstream MERGE.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="knowledge_graph_builder_spark")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="transcripts parquet path")
    src.add_argument("--table", help="transcripts Iceberg table identifier")
    p.add_argument("--output", required=True, help="output directory for graph tables")
    p.add_argument("--checkpoint", default=None, help="stage checkpoint dir (resumable)")
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--session-id", default="batch")
    p.add_argument("--partitions", type=int, default=None, help="kernel parallelism")
    p.add_argument("--format", default=None, choices=["parquet", "json", "csv"],
                   help="input format (default: inferred from path / parquet)")
    p.add_argument("--streaming", action="store_true", help="run the foreachBatch streaming pipeline")
    p.add_argument("--store-root", default=None,
                   help="with --streaming: MERGE micro-batches into the durable graph store at this path (exactly-once) instead of per-batch parquet output")
    args = p.parse_args(argv)

    from .session import get_spark

    spark = get_spark(app_name="kgb-submit")

    if args.streaming:
        if not args.input:
            p.error("--streaming requires --input (a parquet path; table streams need an Iceberg catalog)")
        if args.store_root:
            from .streaming.incremental import stream_kg_to_store

            q = stream_kg_to_store(
                spark, args.input, args.store_root,
                args.checkpoint or f"{args.store_root}/_stream_ckpt",
                session_id=args.session_id,
            )
        else:
            from .streaming.incremental import stream_kg_foreachbatch

            q = stream_kg_foreachbatch(
                spark, args.input, args.output, args.checkpoint or f"{args.output}/_stream_ckpt"
            )
        q.awaitTermination()
        return 0

    from .plans.pipeline import run_pipeline
    from .sources.transcripts import read_transcripts

    transcripts = read_transcripts(spark, args.table or args.input, fmt=args.format)
    res = run_pipeline(
        spark,
        transcripts,
        session_id=args.session_id,
        checkpoint_dir=args.checkpoint,
        run_id=args.run_id,
        kernel_partitions=args.partitions,
    )
    res.nodes.write.mode("overwrite").parquet(f"{args.output}/nodes")
    res.edges.write.mode("overwrite").parquet(f"{args.output}/edges")
    res.triples.write.mode("overwrite").parquet(f"{args.output}/triples")
    res.events.write.mode("overwrite").parquet(f"{args.output}/events")
    for row in res.lineage:
        print(row, file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
