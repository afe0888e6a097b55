"""Durable graph store: the Neo4j-MERGE replacement (S4-S8, D3/D4).

Parquet-backed implementation with Iceberg-shaped semantics:

* ``upsert_nodes`` / ``upsert_edges`` — MERGE by key, last writer wins
  (reference graph_db.py:81-88 SET semantics), implemented as
  union + row_number window over a monotonically increasing batch_seq.
* ``clear_session`` — ``DETACH DELETE`` equivalent (graph_db.py:147-151):
  predicate rewrite of both tables.
* writes are staged (write new state to a temp dir, atomically swap), so
  a killed upsert never corrupts the table — the same write-then-commit
  discipline as the pipeline checkpoints.

With an Iceberg catalog the same frames go through ``MERGE INTO`` and
``DELETE FROM`` and the staging dance disappears; the key/dedup logic is
identical, which is why it lives here and not in the sink.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class GraphStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _read(self, table: str) -> DataFrame | None:
        p = self._path(table)
        if os.path.exists(os.path.join(p, "_SUCCESS")):
            return self.spark.read.parquet(p)
        return None

    def _swap_in(self, df: DataFrame, table: str) -> None:
        """Stage-then-swap: never leaves the table half-written."""
        final = self._path(table)
        staging = f"{final}._staging-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(staging)
        old = f"{final}._old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(staging, final)
        if os.path.exists(old):
            shutil.rmtree(old)

    def _upsert(self, new: DataFrame, table: str, key_cols: list[str]) -> None:
        new = new.withColumn("_batch_seq", F.lit(self._next_seq(table)))
        existing = self._read(table)
        merged = existing.unionByName(new) if existing is not None else new
        # tiebreak beyond _batch_seq: duplicate keys WITHIN one batch share
        # a seq, and row_number over a tied ordering picks a partition-
        # dependent winner — a deterministic whole-row hash keeps retries
        # and replans byte-identical.
        row_hash = F.xxhash64(*[c for c in merged.columns if c != "_batch_seq"])
        w = Window.partitionBy(*key_cols).orderBy(F.col("_batch_seq").desc(), row_hash.desc())
        deduped = (
            merged.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
        )
        self._swap_in(deduped, table)

    def _next_seq(self, table: str) -> int:
        existing = self._read(table)
        if existing is None or "_batch_seq" not in existing.columns:
            return 0
        row = existing.agg(F.max("_batch_seq").alias("m")).collect()[0]
        return int(row["m"] or 0) + 1

    # -- public API ------------------------------------------------------

    def upsert_nodes(self, nodes: DataFrame) -> None:
        """MERGE on (name, type) — graph_db.py:74-88."""
        self._upsert(nodes, "nodes", ["name", "type"])

    def upsert_edges(self, edges: DataFrame) -> None:
        """MERGE on (src, type, dst) — graph_db.py:121-145."""
        self._upsert(edges, "edges", ["src", "type", "dst"])

    def nodes(self) -> DataFrame:
        df = self._read("nodes")
        return df.drop("_batch_seq") if df is not None else None

    def edges(self) -> DataFrame:
        df = self._read("edges")
        return df.drop("_batch_seq") if df is not None else None

    def clear_session(self, session_id: str) -> None:
        """S8 — delete every node/edge of one session (graph_db.py:147-151)."""
        for table in ("nodes", "edges"):
            df = self._read(table)
            if df is not None:
                # null-preserving predicate: a plain != would evaluate to
                # NULL for rows with no session_id and silently delete them
                keep = F.col("session_id").isNull() | (F.col("session_id") != session_id)
                self._swap_in(df.filter(keep), table)


class BatchLedger:
    """Applied-batch ledger for exactly-once streaming MERGE.

    Structured Streaming guarantees foreachBatch is called with a stable
    batch_id per micro-batch; a retried batch re-arrives with the SAME id.
    Recording applied ids (write-then-rename, like the checkpoint
    manifests) makes store upserts exactly-once: a retry of an applied
    batch is skipped instead of re-merged.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, batch_id: int) -> str:
        return os.path.join(self.root, f"batch-{batch_id}.done")

    def applied(self, batch_id: int) -> bool:
        return os.path.exists(self._path(batch_id))

    def mark(self, batch_id: int) -> None:
        tmp = self._path(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            f.write("ok")
        os.replace(tmp, self._path(batch_id))
