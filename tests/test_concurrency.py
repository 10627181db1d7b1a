"""Concurrent-writer safety for persistent collections.

The reference serializes writers with a process-wide RWMutex
(reference collection.go:16-29, db.go:30-40); across processes its gob
persistence has no protection at all.  Our parquet persistence commits
upserts/deletes as read-merge-write, so without serialization two
writers interleave and silently lose updates.  These tests drive TWO
independent Collection handles (as two ingest jobs would) over the same
persist dir from concurrent threads and assert nothing is lost — plus
unit coverage of the lock-file protocol itself.
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from chromem_go_spark import DB, Document
from chromem_go_spark.embeddings.stub import const_embedding
from chromem_go_spark.locking import LockTimeout, write_lock


def _doc(i: int) -> Document:
    return Document(str(i), {"writer": str(i % 2)}, [0.1, 0.2, float(i % 7)], f"doc {i}")


def _open_collection(spark, path: str, n_buckets: int):
    db = DB.new_persistent(spark, path)
    return db.get_or_create_collection(
        "shared", embedding_func=const_embedding, n_buckets=n_buckets
    )


@pytest.mark.parametrize("n_buckets", [0, 8])
def test_two_writers_lose_no_updates(spark, tmp_path, n_buckets):
    """Interleaved upserts from two handles of the same persistent
    collection: every id written by either writer must survive."""
    path = str(tmp_path / f"db_{n_buckets}")
    c1 = _open_collection(spark, path, n_buckets)
    c2 = _open_collection(spark, path, n_buckets)

    n_rounds, batch = 4, 3
    errs: list[BaseException] = []

    def writer(col, offset):
        try:
            for r in range(n_rounds):
                base = offset + r * batch
                col.add_documents([_doc(base + j) for j in range(batch)])
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(c1, 0))
    t2 = threading.Thread(target=writer, args=(c2, 1000))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs

    check = _open_collection(spark, path, n_buckets)
    got = set(check.list_ids())
    want = {str(o + r * batch + j) for o in (0, 1000)
            for r in range(n_rounds) for j in range(batch)}
    assert got == want, f"lost {sorted(want - got)}; extra {sorted(got - want)}"


def test_concurrent_upsert_and_delete(spark, tmp_path):
    """A deleter and an upserter racing over disjoint ids: the deleter's
    removals and the upserter's inserts must BOTH take effect."""
    path = str(tmp_path / "db_ud")
    c1 = _open_collection(spark, path, 8)
    c1.add_documents([_doc(i) for i in range(6)])
    c2 = _open_collection(spark, path, 8)

    errs: list[BaseException] = []

    def upserter():
        try:
            for i in range(100, 106, 2):
                c1.add_documents([_doc(i), _doc(i + 1)])
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    def deleter():
        try:
            for i in range(0, 6, 2):
                c2.delete(ids=[str(i), str(i + 1)])
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=upserter)
    t2 = threading.Thread(target=deleter)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs

    got = set(_open_collection(spark, path, 8).list_ids())
    assert got == {str(i) for i in range(100, 106)}


def test_write_lock_excludes_and_releases(tmp_path):
    d = str(tmp_path)
    order: list[str] = []
    with write_lock(d, timeout=5):
        order.append("a")
        t = threading.Thread(
            target=lambda: (write_lock(d, timeout=5).__enter__(), order.append("b"))
        )
        # a second acquirer must block while the lock is held
        blocked = threading.Thread(target=lambda: None)
        start = time.monotonic()
        with pytest.raises(LockTimeout):
            with write_lock(d, timeout=0.3):
                pass
        assert time.monotonic() - start >= 0.3
        del t, blocked
    # released: immediate re-acquire succeeds
    with write_lock(d, timeout=1):
        order.append("b")
    assert order == ["a", "b"]
    assert not os.path.exists(os.path.join(d, ".write.lock"))


def test_write_lock_release_spares_successor(tmp_path):
    """If a holder's lock was broken (stale) and re-acquired by a
    successor, the original holder's release must NOT delete the
    successor's live lock — release claims the inode atomically and
    verifies the token before unlinking."""
    d = str(tmp_path)
    lock_path = os.path.join(d, ".write.lock")
    with write_lock(d, timeout=1):
        # simulate a successor having broken + re-acquired the lock
        with open(lock_path, "w") as f:
            json.dump({"pid": 0, "token": "successor", "acquired": 0}, f)
    # successor's lock survives the original holder's release
    assert os.path.exists(lock_path)
    with open(lock_path) as f:
        assert json.load(f)["token"] == "successor"
    os.unlink(lock_path)


def test_write_lock_breaks_stale_lock(tmp_path):
    d = str(tmp_path)
    lock_path = os.path.join(d, ".write.lock")
    with open(lock_path, "w") as f:
        f.write("{}")
    old = time.time() - 1000
    os.utime(lock_path, (old, old))
    # stale (dead-writer) lock is broken and acquisition proceeds
    with write_lock(d, timeout=1, stale_after=300):
        assert os.path.exists(lock_path)
    assert not os.path.exists(lock_path)


def test_delete_all_then_upsert(spark, tmp_path):
    """Deleting every row of a bucketed collection drops every bucket
    dir; the table must read back as EMPTY (not crash on a footerless
    directory) and accept fresh upserts — the race test hit exactly
    this when the deleter drained the table before the upserter ran."""
    path = str(tmp_path / "db_drain")
    c = _open_collection(spark, path, 8)
    c.add_documents([_doc(i) for i in range(4)])
    c.delete(ids=[str(i) for i in range(4)])
    assert c.count() == 0
    reopened = _open_collection(spark, path, 8)
    assert reopened.count() == 0
    reopened.add_documents([_doc(7)])
    assert reopened.list_ids() == ["7"]


def test_write_lock_across_processes(tmp_path):
    """The lock excludes across PROCESS boundaries, not just threads:
    a child process holds it; this process must time out, then acquire
    promptly once the child exits."""
    import subprocess
    import sys

    d = str(tmp_path)
    child = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import sys, time; sys.path.insert(0, '/root/repo');"
            "from chromem_go_spark.locking import write_lock;"
            "import contextlib;"
            "ctx = write_lock(sys.argv[1], timeout=5);"
            "ctx.__enter__(); print('held', flush=True); time.sleep(2.5);"
            "ctx.__exit__(None, None, None)",
            d,
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    try:
        assert child.stdout.readline().strip() == "held"
        with pytest.raises(LockTimeout):
            with write_lock(d, timeout=0.5):
                pass
        # child releases within ~2.5s; we must get in afterwards
        with write_lock(d, timeout=10):
            pass
    finally:
        child.wait(timeout=15)


def test_live_long_holder_not_broken(tmp_path):
    """A LIVE writer holding longer than stale_after must not lose the
    lock: the heartbeat keeps mtime fresh, so waiters time out instead
    of breaking in (only dead holders go stale)."""
    d = str(tmp_path)
    # generous margins so scheduler jitter can't fake staleness: the
    # heartbeat fires every 0.5s against a 2s staleness horizon
    with write_lock(d, timeout=1, stale_after=2.0):
        time.sleep(3.0)  # longer than stale_after; heartbeat keeps it fresh
        with pytest.raises(LockTimeout):
            with write_lock(d, timeout=0.5, stale_after=2.0):
                pass
    with write_lock(d, timeout=1):  # released cleanly afterwards
        pass


def test_release_spares_successors_lock(tmp_path):
    """A holder whose lock was broken and re-acquired by a successor
    must not delete the successor's lock on release (ownership token
    check)."""
    import json

    d = str(tmp_path)
    lock_path = os.path.join(d, ".write.lock")
    ctx = write_lock(d, timeout=1)
    ctx.__enter__()
    # simulate a (wrong or right) break + successor re-acquire
    os.unlink(lock_path)
    with open(lock_path, "w") as f:
        json.dump({"token": "successor"}, f)
    ctx.__exit__(None, None, None)
    assert os.path.exists(lock_path), "successor's lock must survive"
    os.unlink(lock_path)
