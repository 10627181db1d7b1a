"""Table-format transaction backend (chromem_go_spark/tablefmt.py).

The Delta-backed tests require delta-spark + the Delta jars and are
skip-marked where (as in this container) they're absent; the detection
and fallback behavior tests always run.
"""

from __future__ import annotations

import json
import os
import threading

import pytest

from chromem_go_spark import DB, Document
from chromem_go_spark import tablefmt
from chromem_go_spark.collection import Collection
from chromem_go_spark.embeddings.stub import const_embedding


def _doc(i: int) -> Document:
    return Document(id=str(i), content=f"doc {i}", embedding=[1.0, 0.0], metadata={})


def test_detection_is_honest(spark):
    """delta_available must reflect THIS session: the container ships
    neither delta-spark nor the jars, so detection is False and the
    delta table_format raises the documented error instead of failing
    later with an opaque py4j stack."""
    if tablefmt.delta_available(spark):
        pytest.skip("delta actually present; covered by the gated tests")
    with pytest.raises(RuntimeError, match="delta-spark"):
        Collection(spark, "c", table_format="delta")


def test_unknown_table_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown table_format"):
        Collection(spark, "c", table_format="orc")


def test_table_format_recorded_in_meta(spark, tmp_path):
    db = DB.new_persistent(spark, str(tmp_path))
    c = db.create_collection("kb", embedding_func=const_embedding([1.0, 0.0]))
    c.add_documents([_doc(1)])
    sub = c.persist_dir
    with open(os.path.join(sub, "collection.json")) as f:
        meta = json.load(f)
    assert meta["table_format"] == "parquet"
    # reopen resolves the same backend
    db2 = DB.new_persistent(spark, str(tmp_path))
    assert db2.get_collection("kb").table_format == "parquet"


# ---------------------------------------------------------------- delta-gated


@pytest.fixture()
def delta_collection(spark, tmp_path):
    pytest.importorskip("delta", reason="delta-spark not installed")
    if not tablefmt.delta_available(spark):
        pytest.skip("delta-spark importable but jars not on the classpath")
    db = DB.new_persistent(spark, str(tmp_path))
    return db.create_collection(
        "kb", embedding_func=const_embedding([1.0, 0.0]), table_format="delta"
    )


def test_delta_upsert_last_wins(delta_collection):
    c = delta_collection
    c.add_documents([_doc(1), _doc(2)])
    c.add_documents(
        [Document(id="1", content="updated", embedding=[0.0, 1.0], metadata={})]
    )
    rows = {r["id"]: r for r in c.df.collect()}
    assert set(rows) == {"1", "2"}
    assert rows["1"]["content"] == "updated"


def test_delta_delete_by_predicate(delta_collection):
    c = delta_collection
    c.add_documents([_doc(i) for i in range(6)])
    c.delete(ids=["2", "4"])
    assert sorted(c.list_ids()) == ["0", "1", "3", "5"]


def test_delta_two_writer_concurrency(spark, tmp_path):
    """Two writers MERGE into the same table with no lock file: Delta's
    optimistic commits must serialize them with no lost updates."""
    pytest.importorskip("delta", reason="delta-spark not installed")
    if not tablefmt.delta_available(spark):
        pytest.skip("delta-spark importable but jars not on the classpath")
    db = DB.new_persistent(spark, str(tmp_path))
    db.create_collection(
        "kb", embedding_func=const_embedding([1.0, 0.0]), table_format="delta"
    )

    errs: list[Exception] = []

    def writer(lo: int, hi: int) -> None:
        try:
            c = DB.new_persistent(spark, str(tmp_path)).get_collection(
                "kb", embedding_func=const_embedding([1.0, 0.0])
            )
            for i in range(lo, hi):
                c.add_documents([_doc(i)])
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [
        threading.Thread(target=writer, args=(0, 8)),
        threading.Thread(target=writer, args=(8, 16)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    got = DB.new_persistent(spark, str(tmp_path)).get_collection("kb")
    assert sorted(got.list_ids(), key=int) == [str(i) for i in range(16)]


# ------------------------------------------------- parquet conformance
# The container ships neither delta-spark nor the jars (no network, no
# vendored wheels — verified), so the gated tests above never run here.
# These conformance tests close that gap two ways:
#
# 1. A parquet-backed DeltaTable DOUBLE that implements the exact
#    subset of the delta.tables API tablefmt uses (isDeltaTable /
#    forPath / alias / merge / whenMatchedUpdateAll /
#    whenNotMatchedInsertAll / execute / delete, including Delta's
#    multi-source-match rejection), so tablefmt.merge_upsert and
#    tablefmt.delete_where EXECUTE end to end in this CI.
# 2. Lock-file-path mirrors of the delta-gated scenarios asserting the
#    identical final tables, so both backends are pinned to the same
#    semantics.


class _FakeMerge:
    def __init__(self, table, source, cond):
        self._table, self._source, self._cond = table, source, cond
        self.calls = []

    def whenMatchedUpdateAll(self):
        self.calls.append("whenMatchedUpdateAll")
        return self

    def whenNotMatchedInsertAll(self):
        self.calls.append("whenNotMatchedInsertAll")
        return self

    def execute(self):
        self.calls.append("execute")
        assert self.calls == [
            "whenMatchedUpdateAll", "whenNotMatchedInsertAll", "execute",
        ]
        # parse "t.<key> = s.<key>" — the only condition tablefmt emits
        key = self._cond.split("=")[0].strip().split(".", 1)[1]
        src = self._source.collect()
        # Delta rejects a source that matches one target row twice
        keys = [r[key] for r in src]
        if len(keys) != len(set(keys)):
            raise Exception(
                "DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE"
            )
        rows = {r[key]: r for r in self._table._rows()}
        rows.update({r[key]: r for r in src})
        self._table._write(list(rows.values()), self._source.schema)


class _FakeDeltaTable:
    """Parquet files + a json row cache per path; same visible contract
    as the real DeltaTable for tablefmt's call patterns."""

    def __init__(self, spark, path):
        self._spark, self._path = spark, path
        self._alias = None
        self.last_merge = None

    # --- class-level API
    @classmethod
    def isDeltaTable(cls, spark, path):
        return os.path.isdir(path)

    @classmethod
    def forPath(cls, spark, path):
        return cls(spark, path)

    # --- instance API
    def alias(self, a):
        self._alias = a
        return self

    def merge(self, source, cond):
        self.last_merge = _FakeMerge(self, source, cond)
        return self.last_merge

    def delete(self, condition):
        df = self._spark.read.parquet(self._path).filter(~condition)
        self._write(df.collect(), df.schema)

    # --- helpers
    def _rows(self):
        return self._spark.read.parquet(self._path).collect()

    def _write(self, rows, schema):
        df = self._spark.createDataFrame(rows, schema)
        df.write.mode("overwrite").parquet(self._path)


@pytest.fixture()
def fake_delta(monkeypatch):
    """Install the double as delta.tables.DeltaTable and route the
    first-write creation through plain parquet."""
    import sys
    import types

    from chromem_go_spark import tablefmt as tf

    delta_mod = types.ModuleType("delta")
    tables_mod = types.ModuleType("delta.tables")
    tables_mod.DeltaTable = _FakeDeltaTable
    delta_mod.tables = tables_mod
    monkeypatch.setitem(sys.modules, "delta", delta_mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables_mod)
    monkeypatch.setattr(
        tf, "_create_table",
        lambda updates, path: updates.write.mode("overwrite").parquet(path),
    )
    return tf


def test_merge_upsert_protocol_executes(spark, tmp_path, fake_delta):
    """tablefmt.merge_upsert runs end to end: create, then MERGE with
    update-all/insert-all, producing the last-writer-wins table the
    parquet lock path produces for the same batches."""
    tf = fake_delta
    path = str(tmp_path / "tbl")
    b1 = spark.createDataFrame(
        [("1", "doc 1"), ("2", "doc 2")], "id string, content string"
    )
    tf.merge_upsert(spark, path, b1, key_col="id")
    b2 = spark.createDataFrame(
        [("1", "updated"), ("3", "doc 3")], "id string, content string"
    )
    tf.merge_upsert(spark, path, b2, key_col="id")
    rows = {r["id"]: r["content"] for r in spark.read.parquet(path).collect()}
    assert rows == {"1": "updated", "2": "doc 2", "3": "doc 3"}


def test_merge_upsert_collapses_same_batch_dupes(spark, tmp_path, fake_delta):
    """Without the dropDuplicates guard the double (like Delta) throws
    the multi-source-match error; with it the batch upserts cleanly."""
    tf = fake_delta
    path = str(tmp_path / "tbl")
    tf.merge_upsert(
        spark,
        path,
        spark.createDataFrame([("1", "a")], "id string, content string"),
    )
    dup = spark.createDataFrame(
        [("1", "x"), ("1", "y")], "id string, content string"
    )
    tf.merge_upsert(spark, path, dup, key_col="id")  # must not raise
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 1 and rows[0]["id"] == "1"


def test_delete_where_executes(spark, tmp_path, fake_delta):
    from pyspark.sql import functions as F

    tf = fake_delta
    path = str(tmp_path / "tbl")
    tf.merge_upsert(
        spark,
        path,
        spark.createDataFrame(
            [(str(i), f"doc {i}") for i in range(6)], "id string, content string"
        ),
    )
    tf.delete_where(spark, path, F.col("id").isin("2", "4"))
    assert sorted(r["id"] for r in spark.read.parquet(path).collect()) == [
        "0", "1", "3", "5",
    ]


def test_parquet_upsert_last_wins_mirror(spark, tmp_path):
    """Lock-file-path mirror of test_delta_upsert_last_wins: identical
    batches, identical final table."""
    db = DB.new_persistent(spark, str(tmp_path))
    c = db.create_collection("kb", embedding_func=const_embedding([1.0, 0.0]))
    c.add_documents([_doc(1), _doc(2)])
    c.add_documents(
        [Document(id="1", content="updated", embedding=[0.0, 1.0], metadata={})]
    )
    rows = {r["id"]: r for r in c.df.collect()}
    assert set(rows) == {"1", "2"}
    assert rows["1"]["content"] == "updated"


def test_parquet_delete_by_predicate_mirror(spark, tmp_path):
    db = DB.new_persistent(spark, str(tmp_path))
    c = db.create_collection("kb", embedding_func=const_embedding([1.0, 0.0]))
    c.add_documents([_doc(i) for i in range(6)])
    c.delete(ids=["2", "4"])
    assert sorted(c.list_ids()) == ["0", "1", "3", "5"]


def test_parquet_two_writer_mirror(spark, tmp_path):
    """Mirror of test_delta_two_writer_concurrency through the lock
    file: two concurrent writers, no lost updates, same final ids."""
    db = DB.new_persistent(spark, str(tmp_path))
    db.create_collection("kb", embedding_func=const_embedding([1.0, 0.0]))

    errs: list[Exception] = []

    def writer(lo: int, hi: int) -> None:
        try:
            c = DB.new_persistent(spark, str(tmp_path)).get_collection(
                "kb", embedding_func=const_embedding([1.0, 0.0])
            )
            for i in range(lo, hi):
                c.add_documents([_doc(i)])
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [
        threading.Thread(target=writer, args=(0, 8)),
        threading.Thread(target=writer, args=(8, 16)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    got = DB.new_persistent(spark, str(tmp_path)).get_collection("kb")
    assert sorted(got.list_ids(), key=int) == [str(i) for i in range(16)]
