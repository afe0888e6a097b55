"""Iceberg-native graph store: the same MERGE semantics as ``GraphStore``
expressed through a real Iceberg runtime when one is on the classpath
(S4-S6/D3/D4; reference graph_db.py:74-145 Neo4j MERGE).

``GraphStore``'s two commit protocols exist because this sandbox has no
Iceberg jar: ``manifest`` mode reimplements the metadata-pointer pattern
by hand (immutable commit dirs + one atomic pointer swap). With the
``iceberg-spark-runtime`` jar present, all of that machinery is the
catalog's job and the store reduces to three SQL statements:

* upsert  -> ``MERGE INTO t USING batch ON <key> WHEN MATCHED THEN
  UPDATE SET * WHEN NOT MATCHED THEN INSERT *``
* read    -> ``SELECT * FROM t`` (snapshot isolation from the catalog)
* clear   -> ``DELETE FROM t WHERE session_id = ...``

Tables are created ``PARTITIONED BY (bucket(N, <first key col>))`` — the
same hash-bucket layout ``GraphStore`` builds by hand, so an upsert
rewrites only the buckets its batch touches (Iceberg's copy-on-write
MERGE prunes by partition).

Capability-gated: ``iceberg_available(spark)`` probes the JVM classpath;
everything here raises cleanly without the jar and the tests skip. The
session must also carry an Iceberg catalog config, e.g.::

    spark.sql.catalog.local                 org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.local.type            hadoop
    spark.sql.catalog.local.warehouse       /path/to/warehouse
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on this session's JVM
    classpath (the capability probe the gated tests key on)."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class IcebergGraphStore:
    """MERGE-keyed node/edge store over Iceberg tables.

    Public surface mirrors ``GraphStore`` (upsert_nodes/upsert_edges/
    nodes/edges/clear_session) so callers can swap stores by constructor;
    parity of MERGE semantics is what the gated test pins.
    """

    _KEY_COLS = {"nodes": ["name", "type"], "edges": ["src", "type", "dst"]}

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "kg", n_buckets: int = 64):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime jar not on the classpath; use GraphStore "
                "(commit_mode='manifest') for the portable protocol"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        self.n_buckets = n_buckets
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    def _qualified(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def _ensure_table(self, df: DataFrame, table: str) -> None:
        key0 = self._KEY_COLS[table][0]
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._qualified(table)} ({cols}) "
            f"USING iceberg PARTITIONED BY (bucket({self.n_buckets}, {key0}))"
        )

    def _upsert(self, new: DataFrame, table: str) -> None:
        key_cols = self._KEY_COLS[table]
        self._ensure_table(new, table)
        # within-batch duplicate keys: keep one deterministic winner, the
        # same whole-row-hash tiebreak GraphStore._dedup applies (MERGE
        # INTO requires a unique source key)
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy(*key_cols).orderBy(F.xxhash64(*new.columns).desc())
        deduped = (
            new.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # per-call unique temp view: a session-global name like
        # _batch_nodes collides across concurrent store instances in one
        # session (round-4 advice) — two in-flight upserts would MERGE
        # each other's batches
        import uuid

        view = f"_batch_{table}_{uuid.uuid4().hex[:12]}"
        deduped.createOrReplaceTempView(view)
        try:
            on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
            self.spark.sql(
                f"MERGE INTO {self._qualified(table)} t USING {view} s ON {on} "
                f"WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
            )
        finally:
            self.spark.catalog.dropTempView(view)

    def upsert_nodes(self, nodes: DataFrame) -> None:
        self._upsert(nodes, "nodes")

    def upsert_edges(self, edges: DataFrame) -> None:
        self._upsert(edges, "edges")

    def _read(self, table: str) -> DataFrame:
        return self.spark.table(self._qualified(table))

    def nodes(self) -> DataFrame:
        return self._read("nodes")

    def edges(self) -> DataFrame:
        return self._read("edges")

    def clear_session(self, session_id: str) -> None:
        from pyspark.errors import AnalysisException

        for table in ("nodes", "edges"):
            try:
                # parameterized, not interpolated: a session_id is caller
                # input and must not be able to rewrite the DELETE
                # (round-4 advice)
                self.spark.sql(
                    f"DELETE FROM {self._qualified(table)} WHERE session_id = :sid",
                    args={"sid": session_id},
                )
            except AnalysisException as exc:
                # ONLY "table does not exist yet" is a benign no-op; a
                # catalog/connection failure must surface, not masquerade
                # as nothing-to-clear
                if "TABLE_OR_VIEW_NOT_FOUND" not in str(exc):
                    raise
