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
