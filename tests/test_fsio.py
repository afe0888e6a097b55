"""fsio shim (round-4 verdict ask #4): store/lineage metadata I/O must
run wherever the data lives, not only on the driver's local disk. The
Hadoop backend is exercised against ``file:`` URIs (RawLocalFileSystem)
— the py4j plumbing is identical for hdfs://s3a://, only the FileSystem
implementation behind the Path differs."""

import json
import os

import pytest

from knowledge_graph_builder_spark.sources.fsio import (
    HadoopFileIO,
    PosixFileIO,
    io_for,
)


def test_io_for_selects_backend(spark):
    assert isinstance(io_for("/tmp/x"), PosixFileIO)
    assert isinstance(io_for("file:/tmp/x"), PosixFileIO)
    assert isinstance(io_for("hdfs://nn/x", spark), HadoopFileIO)
    with pytest.raises(ValueError):
        io_for("s3a://bucket/x")  # remote scheme without a session


@pytest.mark.parametrize("backend", ["posix", "hadoop"])
def test_backends_roundtrip(spark, tmp_path, backend):
    """Same contract on both backends: mkdirs/exists/write-atomic/read/
    list/rename/rmtree, plus atomic overwrite of an existing file."""
    io = PosixFileIO() if backend == "posix" else HadoopFileIO(spark)
    root = (str(tmp_path) if backend == "posix" else f"file:{tmp_path}") + "/store"
    assert not io.exists(root)
    io.makedirs(root)
    assert io.exists(root) and io.isdir(root)

    p = f"{root}/manifest.json"
    io.write_text_atomic(p, json.dumps({"seq": 1}))
    assert io.exists(p) and not io.isdir(p)
    assert json.loads(io.read_text(p)) == {"seq": 1}
    # atomic overwrite (the manifest-pointer swap)
    io.write_text_atomic(p, json.dumps({"seq": 2}))
    assert json.loads(io.read_text(p)) == {"seq": 2}
    # no tmp litter left behind by the staged writes
    assert [e for e in io.listdir(root) if "tmp-" in e] == []

    io.append_text(p, "\nx")
    assert io.read_text(p).endswith("\nx")

    io.makedirs(f"{root}/commit-1/_bucket=3")
    assert "commit-1" in io.listdir(root)
    io.rename(f"{root}/commit-1", f"{root}/commit-2")
    assert io.isdir(f"{root}/commit-2/_bucket=3")
    assert "commit-1" not in io.listdir(root)

    io.rmtree(f"{root}/commit-2")
    assert not io.exists(f"{root}/commit-2")
    # rmtree of a missing path is a no-op, not an error
    io.rmtree(f"{root}/never-existed")


def test_manifest_graphstore_through_hadoop_backend(spark, tmp_path):
    """The full manifest-mode MERGE protocol running with every metadata
    operation routed through the Hadoop FileSystem (file: URI): upsert,
    last-writer-wins re-upsert, manifest swap, vacuum of superseded
    commit dirs."""
    from knowledge_graph_builder_spark.sources.graph_store import GraphStore

    root = f"file:{tmp_path}/graph"
    io = HadoopFileIO(spark)
    store = GraphStore(spark, root, n_buckets=4, commit_mode="manifest", io=io)

    nodes1 = spark.createDataFrame(
        [("Acme", "ORG", "s1"), ("Ada", "PERSON", "s1")],
        "name string, type string, session_id string",
    )
    store.upsert_nodes(nodes1)
    assert {(r.name, r.type) for r in store.nodes().collect()} == {
        ("Acme", "ORG"),
        ("Ada", "PERSON"),
    }
    # MERGE: same key updates, new key inserts
    nodes2 = spark.createDataFrame(
        [("Acme", "ORG", "s2"), ("Bob", "PERSON", "s1")],
        "name string, type string, session_id string",
    )
    store.upsert_nodes(nodes2)
    got = {(r.name, r.type): r.session_id for r in store.nodes().collect()}
    assert got == {
        ("Acme", "ORG"): "s2",
        ("Ada", "PERSON"): "s1",
        ("Bob", "PERSON"): "s1",
    }
    # the manifest file itself lives behind the shim
    assert io.exists(f"{root}/nodes.manifest.json")
    manifest = json.loads(io.read_text(f"{root}/nodes.manifest.json"))
    assert manifest["seq"] == 1
    # vacuum removes nothing live, then removes a superseded commit
    removed = store.vacuum("nodes")
    live = set(manifest["buckets"].values())
    assert set(removed).isdisjoint(live)
    # reopen from a fresh store object: state persists via the manifest
    store2 = GraphStore(spark, root, n_buckets=4, commit_mode="manifest", io=io)
    assert store2.nodes().count() == 3
    store2.clear_session("s1")
    assert {r.name for r in store2.nodes().collect()} == {"Acme"}


def test_posix_and_file_uri_are_same_store(tmp_path):
    """file: URIs and bare paths address the same bytes through the
    POSIX backend (scheme stripping)."""
    io = PosixFileIO()
    io.makedirs(f"file:{tmp_path}/d")
    io.write_text_atomic(f"{tmp_path}/d/x.txt", "hello")
    assert io.read_text(f"file:{tmp_path}/d/x.txt") == "hello"
    assert os.path.isdir(f"{tmp_path}/d")
