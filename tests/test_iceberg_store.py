"""Gated Iceberg-runtime tests (round-3 verdict ask #7).

These run ONLY when an ``iceberg-spark-runtime`` jar is on the
classpath (set ``KGB_ICEBERG_JAR`` to its path, or bake it into the
Spark install); this sandbox has none, so they skip — the point is that
the real-catalog path exists, is testable, and its MERGE semantics are
pinned against ``GraphStore`` the moment a jar appears.
"""

import os

import pytest

ICEBERG_JAR = os.environ.get("KGB_ICEBERG_JAR", "")


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    if not ICEBERG_JAR or not os.path.exists(ICEBERG_JAR):
        pytest.skip("no Iceberg runtime jar (set KGB_ICEBERG_JAR)")
    from knowledge_graph_builder_spark.session import get_spark

    warehouse = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark = get_spark(
        app_name="kgb-iceberg-test",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.jars": ICEBERG_JAR,
            "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
            "spark.sql.catalog.local.type": "hadoop",
            "spark.sql.catalog.local.warehouse": warehouse,
        },
    )
    from knowledge_graph_builder_spark.sources.iceberg_store import iceberg_available

    if not iceberg_available(spark):
        spark.stop()
        pytest.skip("Iceberg jar present but SparkCatalog class not loadable")
    yield spark
    spark.stop()


def _nodes_df(spark, rows):
    return spark.createDataFrame(rows, "name string, type string, session_id string")


def test_iceberg_merge_matches_graphstore(iceberg_spark, tmp_path):
    """Same upsert batches through IcebergGraphStore and the portable
    GraphStore must land the identical MERGE state."""
    from knowledge_graph_builder_spark.sources.graph_store import GraphStore
    from knowledge_graph_builder_spark.sources.iceberg_store import IcebergGraphStore

    spark = iceberg_spark
    ice = IcebergGraphStore(spark, catalog="local", namespace="t1", n_buckets=8)
    ref = GraphStore(spark, str(tmp_path / "ref"), n_buckets=8, commit_mode="manifest")
    batches = [
        [("Apple", "ORG", "s1"), ("Jobs", "PERSON", "s1")],
        [("Apple", "ORG", "s2"), ("MSFT", "ORG", "s2")],
    ]
    for batch in batches:
        ice.upsert_nodes(_nodes_df(spark, batch))
        ref.upsert_nodes(_nodes_df(spark, batch))

    def state(df):
        return {(r["name"], r["type"]): r["session_id"] for r in df.collect()}

    assert state(ice.nodes().select("name", "type", "session_id")) == state(
        ref.nodes().select("name", "type", "session_id")
    )


def test_iceberg_clear_session(iceberg_spark):
    from knowledge_graph_builder_spark.sources.iceberg_store import IcebergGraphStore

    spark = iceberg_spark
    store = IcebergGraphStore(spark, catalog="local", namespace="t2", n_buckets=8)
    store.upsert_nodes(_nodes_df(spark, [("Apple", "ORG", "s1"), ("MSFT", "ORG", "s2")]))
    store.clear_session("s1")
    assert [r["name"] for r in store.nodes().collect()] == ["MSFT"]


def test_iceberg_store_raises_cleanly_without_jar(spark):
    """On a jar-less session the store must refuse loudly, pointing at
    the portable protocol (this part runs everywhere)."""
    from knowledge_graph_builder_spark.sources.iceberg_store import (
        IcebergGraphStore,
        iceberg_available,
    )

    if iceberg_available(spark):
        pytest.skip("Iceberg unexpectedly present; gated tests cover this")
    with pytest.raises(RuntimeError, match="manifest"):
        IcebergGraphStore(spark, catalog="local")
