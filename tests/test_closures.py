"""Task-closure shipping contracts (r12).

Every per-task kernel that runs once per shard per trigger/batch must
ship a BOUNDED closure: batch-sized payloads ride a Spark broadcast
(pickled as a fixed-size handle, fetched once per executor) or the
DataFrame itself — never the task closure, which re-serializes per
task.  These tests pin that contract structurally (what the closure
captures) and by measurement (serialized closure size is independent
of batch width), so a future edit that quietly closes over a
batch-sized object fails here instead of shipping tens of MB per task
at the 1M-id filter cap (the r11 ADVICE finding this round fixed).

Audit scope (r12): the only executor-side closures the streaming
sinks serialize per trigger are the sharded sink's append kernel
(pinned below) and applyInPandasWithState's update fn (captures only
the key/state machinery).  Every other sink moves batch data through
DataFrame plans and persistent state through disk commits; the IVF
serving sinks ship query batches through the r10 normalized probe
tables (SCALE.md probe-table economics), and the sharded walk path
ships them through the r12 broadcast (SCALE.md query-shipping
economics) — both measured, both pinned here structurally.
"""

from __future__ import annotations

import inspect

import pytest

SCALARS = (str, int, float, bool, type(None))


def _closure_vars(fn):
    cv = inspect.getclosurevars(fn)
    return dict(cv.nonlocals)


@pytest.fixture(scope="module")
def spark():
    from chromem_go_spark.session import get_spark

    return get_spark("closure_contracts")


def test_walk_kernel_ships_only_scalars_and_broadcast(spark):
    """sharded_search_batch's walk kernel: everything batch-sized
    (query ids/vectors, allowed sets) rides the broadcast; every other
    captured name is a scalar."""
    from pyspark.broadcast import Broadcast

    from chromem_go_spark.operators.hnsw import _make_walk_kernel

    bc = spark.sparkContext.broadcast((["0"], [[0.1] * 4], None, None))
    kern = _make_walk_kernel(bc, "/tmp/root", "vec_id", 5, 16, None)
    cv = _closure_vars(kern)
    assert isinstance(cv.pop("bc"), Broadcast)
    bad = {k: type(v).__name__ for k, v in cv.items()
           if not isinstance(v, SCALARS)
           and not inspect.ismodule(v)}  # module refs pickle by name
    assert not bad, f"non-scalar closure captures: {bad}"


def test_walk_kernel_closure_size_independent_of_batch_width(spark):
    """The serialized task payload must not grow with the query batch:
    a 512-query broadcast and a 1-query broadcast produce closures of
    identical pickled size (the broadcast pickles as a handle)."""
    from pyspark import cloudpickle

    from chromem_go_spark.operators.hnsw import _make_walk_kernel

    bc1 = spark.sparkContext.broadcast((["0"], [[0.1] * 4], None, None))
    big_allowed = set(range(100_000))
    bc2 = spark.sparkContext.broadcast(
        (
            [str(i) for i in range(512)],
            [[0.1] * 64] * 512,
            big_allowed,
            None,
        )
    )
    k1 = _make_walk_kernel(bc1, "/tmp/root", "vec_id", 5, 16, None)
    k2 = _make_walk_kernel(bc2, "/tmp/root", "vec_id", 5, 16, None)
    assert len(cloudpickle.dumps(k1)) == len(cloudpickle.dumps(k2))


def test_sharded_append_kernel_ships_only_scalars():
    """The sharded ingest sink's per-shard kernel: the micro-batch's
    rows flow through the grouped DataFrame; the closure carries only
    scalars (root path, batch id, graph params) — constant per task,
    per trigger, at any batch width."""
    from pyspark import cloudpickle

    from chromem_go_spark.streaming.ingest import _make_append_shard_kernel

    kern = _make_append_shard_kernel(
        "/tmp/root", 7, "vec_id", "embedding", 16, 200, 42, 1_000_000,
        "op",
    )
    cv = _closure_vars(kern)
    bad = {k: type(v).__name__ for k, v in cv.items()
           if not isinstance(v, SCALARS)
           and not inspect.ismodule(v)}  # module refs pickle by name
    assert not bad, f"non-scalar closure captures: {bad}"
    # and the whole serialized kernel is small in absolute terms
    assert len(cloudpickle.dumps(kern)) < 16_384


def test_split_kernel_ships_only_scalars():
    """split_shard's executor kernel: the cell's points load from the
    shard's committed snapshot inside the task; the closure carries
    only scalars plus the two pre-allocated sub-cell ids (and the
    staging path — a str)."""
    from pyspark import cloudpickle

    from chromem_go_spark.operators.hnsw import _make_split_kernel

    kern = _make_split_kernel("/tmp/root", 3, (16, 17), 16, 200, 42,
                              1_000_000, "/tmp/root/_split_stage_3")
    cv = _closure_vars(kern)
    new_ids = cv.pop("new_ids", None)
    assert new_ids == (16, 17)
    bad = {k: type(v).__name__ for k, v in cv.items()
           if not isinstance(v, SCALARS)
           and not inspect.ismodule(v)}
    assert not bad, f"non-scalar closure captures: {bad}"
    assert len(cloudpickle.dumps(kern)) < 16_384
