"""Crash consistency of the shared __batch fold protocol
(chromem_go_spark/batchstate.py): marker healing and duplicate
collapse after a simulated mid-fold crash."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

import pytest

from chromem_go_spark.batchstate import drop_batch_partition, fold_batch_partitions


def _write_batches(spark, path: str, n_batches: int, rows_per: int) -> None:
    for b in range(n_batches):
        df = spark.range(b * rows_per, (b + 1) * rows_per).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        (
            df.withColumn("__batch", F.lit(b))
            .write.mode("append")
            .partitionBy("__batch")
            .parquet(path)
        )


def test_fold_heals_pending_marker(spark, tmp_path):
    """Crash AFTER the marker committed, BEFORE deletes/promote: the
    next fold must finish the plan — delete the listed dirs, promote
    the staging dir to the base — without duplicating or losing rows."""
    path = str(tmp_path / "tbl")
    _write_batches(spark, path, 3, 10)
    # simulate: fold staged everything into __batch=-2 and committed
    # its marker, then crashed before the deletes/rename
    src = spark.read.parquet(path).drop("__batch")
    (
        src.withColumn("__batch", F.lit(-2))
        .write.mode("append")
        .partitionBy("__batch")
        .parquet(path)
    )
    with open(os.path.join(path, "_compact_pending.json"), "w") as f:
        json.dump(
            {"delete": ["__batch=0", "__batch=1", "__batch=2"], "stage": "__batch=-2"},
            f,
        )

    fold_batch_partitions(spark, path, ["__batch"], -1)
    parts = [d for d in os.listdir(path) if d.startswith("__batch=")]
    assert parts == ["__batch=-1"]
    out = spark.read.parquet(path)
    assert out.count() == 30  # healed: promoted staging, no duplicates
    assert not os.path.exists(os.path.join(path, "_compact_pending.json"))


def test_fold_survives_partial_marker(spark, tmp_path):
    """A zero-length / garbage marker (possible only via manual damage
    or pre-atomic-rename versions) must be discarded, not wedge every
    subsequent fold with a parse error."""
    path = str(tmp_path / "tblp")
    _write_batches(spark, path, 2, 10)
    with open(os.path.join(path, "_compact_pending.json"), "w") as f:
        f.write("")  # truncated marker
    fold_batch_partitions(spark, path, ["__batch"], -1)
    parts = [d for d in os.listdir(path) if d.startswith("__batch=")]
    assert parts == ["__batch=-1"]
    assert spark.read.parquet(path).count() == 20


def test_fold_collapses_crash_duplicates(spark, tmp_path):
    """Crash BETWEEN overwrite and marker write leaves history both in
    the base and in its original dirs (no marker): the next fold's
    dropDuplicates collapses them instead of baking them in."""
    path = str(tmp_path / "tbl2")
    _write_batches(spark, path, 2, 10)
    # simulate the no-marker crash window: base already holds a copy of
    # batch 0, batch 0's dir still present
    b0 = spark.read.parquet(path).filter(F.col("__batch") == 0).drop("__batch")
    (
        b0.withColumn("__batch", F.lit(-1))
        .write.mode("append")
        .partitionBy("__batch")
        .parquet(path)
    )
    assert spark.read.parquet(path).count() == 30  # transient duplicates

    fold_batch_partitions(spark, path, ["__batch"], -1)
    out = spark.read.parquet(path)
    assert out.count() == 20  # duplicates collapsed, nothing lost
    assert sorted(r["k"] for r in out.collect()) == list(range(20))


def test_fold_respects_exclude_and_threshold(spark, tmp_path):
    path = str(tmp_path / "tbl3")
    _write_batches(spark, path, 3, 5)
    # threshold above the foldable count: nothing happens
    fold_batch_partitions(spark, path, ["__batch"], -1, threshold=5)
    assert len([d for d in os.listdir(path) if d.startswith("__batch=")]) == 3
    # exclude the current batch (2): only 0 and 1 fold
    fold_batch_partitions(spark, path, ["__batch"], -1, exclude_batch=2)
    parts = sorted(d for d in os.listdir(path) if d.startswith("__batch="))
    assert parts == ["__batch=-1", "__batch=2"]
    assert spark.read.parquet(path).count() == 15


def test_fold_missing_table_is_noop(spark, tmp_path):
    fold_batch_partitions(spark, str(tmp_path / "nope"), ["__batch"], -1)


def test_drop_batch_partition_rejects_reserved_ids(spark, tmp_path):
    """batch_id=-1/-2 name the compacted base and staging partitions;
    'replaying' one of those would silently delete the entire index, so
    it must be a hard error, not a destructive no-questions delete."""
    path = str(tmp_path / "tblneg")
    _write_batches(spark, path, 1, 5)
    for bad in (-1, -2):
        with pytest.raises(ValueError, match="reserved"):
            drop_batch_partition(spark, path, bad)
    drop_batch_partition(spark, path, 0)  # legit replay still works
    assert not os.path.exists(os.path.join(path, "__batch=0"))


def _simulate_crash_state(spark, path: str, point: str) -> None:
    """Drive the table into exactly the on-disk state a crash at
    ``point`` leaves behind, by performing the fold protocol's steps
    manually in order and stopping. Steps (batchstate.py):
      1 stage folded rows to __batch=-2       -> crash: 'staged'
      2 commit marker atomically              -> crash: 'marker'
      3 delete source dirs one at a time      -> crash: 'deleted_1',
                                                 'deleted_all'
      4 rename staging -> base                -> crash: 'renamed'
      (5 delete marker = fold complete)
    """
    import shutil

    src = spark.read.parquet(path).drop("__batch").dropDuplicates()
    (
        src.withColumn("__batch", F.lit(-2))
        .write.mode("append")
        .partitionBy("__batch")
        .parquet(path)
    )
    if point == "staged":
        return
    deletes = sorted(
        d
        for d in os.listdir(path)
        if d.startswith("__batch=") and d not in ("__batch=-2",)
    )
    with open(os.path.join(path, "_compact_pending.json"), "w") as f:
        json.dump({"delete": deletes, "stage": "__batch=-2"}, f)
    if point == "marker":
        return
    n_del = {"deleted_1": 1}.get(point, len(deletes))
    for d in deletes[:n_del]:
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    if point in ("deleted_1", "deleted_all"):
        return
    os.rename(os.path.join(path, "__batch=-2"), os.path.join(path, "__batch=-1"))
    assert point == "renamed"


@pytest.mark.parametrize(
    "point", ["staged", "marker", "deleted_1", "deleted_all", "renamed"]
)
def test_fold_crash_at_every_step_loses_nothing(spark, tmp_path, point):
    """Kill-inject between every step of stage->marker->promote: the
    NEXT fold must converge to exactly one base partition holding every
    row exactly once (at-least-once during the window, no-loss always,
    duplicates collapsed on fold) and clear the marker."""
    path = str(tmp_path / f"crash_{point}")
    _write_batches(spark, path, 3, 10)
    _simulate_crash_state(spark, path, point)

    fold_batch_partitions(spark, path, ["__batch"], -1)

    parts = sorted(d for d in os.listdir(path) if d.startswith("__batch="))
    assert parts == ["__batch=-1"]
    assert not os.path.exists(os.path.join(path, "_compact_pending.json"))
    out = spark.read.parquet(path)
    assert sorted(r["k"] for r in out.collect()) == list(range(30))


@pytest.mark.parametrize("point", ["staged", "marker", "deleted_all"])
def test_fold_crash_then_append_then_fold(spark, tmp_path, point):
    """A crash window followed by MORE appended batches (the streaming
    reality) still converges: new partitions fold in alongside the
    healed state with no loss and no duplicates."""
    path = str(tmp_path / f"crashapp_{point}")
    _write_batches(spark, path, 2, 10)
    _simulate_crash_state(spark, path, point)
    df = spark.range(20, 30).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    (
        df.withColumn("__batch", F.lit(7))
        .write.mode("append")
        .partitionBy("__batch")
        .parquet(path)
    )

    fold_batch_partitions(spark, path, ["__batch"], -1)

    parts = sorted(d for d in os.listdir(path) if d.startswith("__batch="))
    assert parts == ["__batch=-1"]
    out = spark.read.parquet(path)
    assert sorted(r["k"] for r in out.collect()) == list(range(30))


# ---------------------------------------------------------- manifest mode

from chromem_go_spark.batchstate import read_live  # noqa: E402


def _live_keys(spark, path):
    return sorted(r["k"] for r in read_live(spark, path).collect())


def test_manifest_fold_basic_and_alternating_generations(spark, tmp_path):
    """Object-store-safe mode: fold commits by writing _base_manifest
    (no directory renames); repeated folds alternate the generation dir
    and never lose or duplicate rows."""
    path = str(tmp_path / "m1")
    _write_batches(spark, path, 3, 10)
    fold_batch_partitions(spark, path, ["__batch"], -1, commit_mode="manifest")
    assert os.path.exists(os.path.join(path, "_base_manifest.json"))
    assert _live_keys(spark, path) == list(range(30))
    with open(os.path.join(path, "_base_manifest.json")) as f:
        gen1 = json.load(f)["base"]

    # append two more batches, fold again: generation alternates
    for b in (7, 8):
        df = spark.range(30 + (b - 7) * 10, 40 + (b - 7) * 10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        (
            df.withColumn("__batch", F.lit(b))
            .write.mode("append")
            .partitionBy("__batch")
            .parquet(path)
        )
    fold_batch_partitions(spark, path, ["__batch"], -1, commit_mode="manifest")
    with open(os.path.join(path, "_base_manifest.json")) as f:
        man2 = json.load(f)
    assert man2["base"] != gen1
    assert _live_keys(spark, path) == list(range(50))
    # obsolete dirs were garbage-collected post-commit
    parts = sorted(d for d in os.listdir(path) if d.startswith("__batch="))
    assert parts == [man2["base"]]


def test_manifest_uncommitted_generation_is_invisible(spark, tmp_path):
    """Crash AFTER writing the new generation dir, BEFORE the manifest
    commit: readers must not see the duplicate rows; the next fold
    replaces the stale dir and converges."""
    path = str(tmp_path / "m2")
    _write_batches(spark, path, 2, 10)
    # simulate: fold wrote __batch=-3 (a full folded copy) then died
    src = spark.read.parquet(path).drop("__batch")
    (
        src.withColumn("__batch", F.lit(-3))
        .write.mode("append")
        .partitionBy("__batch")
        .parquet(path)
    )
    assert _live_keys(spark, path) == list(range(20))  # no duplicates
    fold_batch_partitions(spark, path, ["__batch"], -1, commit_mode="manifest")
    assert _live_keys(spark, path) == list(range(20))


def test_manifest_commit_without_gc_is_exactly_once(spark, tmp_path):
    """Crash AFTER the manifest commit, BEFORE garbage collection: the
    obsolete dirs still exist but readers must ignore them (exactly-once
    view); the next fold's healing collects them and prunes the
    manifest."""
    path = str(tmp_path / "m3")
    _write_batches(spark, path, 2, 10)
    src = spark.read.parquet(path).drop("__batch").dropDuplicates()
    (
        src.withColumn("__batch", F.lit(-3))
        .write.mode("append")
        .partitionBy("__batch")
        .parquet(path)
    )
    with open(os.path.join(path, "_base_manifest.json"), "w") as f:
        json.dump({"base": "__batch=-3", "obsolete": ["__batch=0", "__batch=1"]}, f)
    assert _live_keys(spark, path) == list(range(20))  # obsolete ignored

    # next fold heals: GC + manifest prune (threshold high: no new fold)
    fold_batch_partitions(
        spark, path, ["__batch"], -1, commit_mode="manifest", threshold=99
    )
    parts = sorted(d for d in os.listdir(path) if d.startswith("__batch="))
    assert parts == ["__batch=-3"]
    with open(os.path.join(path, "_base_manifest.json")) as f:
        assert json.load(f)["obsolete"] == []
    assert _live_keys(spark, path) == list(range(20))


def test_read_live_is_plain_read_for_rename_tables(spark, tmp_path):
    path = str(tmp_path / "m4")
    _write_batches(spark, path, 2, 10)
    assert _live_keys(spark, path) == list(range(20))
    fold_batch_partitions(spark, path, ["__batch"], -1)  # rename mode
    assert _live_keys(spark, path) == list(range(20))


def test_manifest_exclude_batch_respected(spark, tmp_path):
    """The CURRENT batch keeps its replay-overwrite contract through a
    manifest-mode fold, same as rename mode."""
    path = str(tmp_path / "m5")
    _write_batches(spark, path, 3, 5)
    fold_batch_partitions(
        spark, path, ["__batch"], -1, commit_mode="manifest", exclude_batch=2
    )
    parts = sorted(d for d in os.listdir(path) if d.startswith("__batch="))
    with open(os.path.join(path, "_base_manifest.json")) as f:
        base = json.load(f)["base"]
    assert parts == sorted([base, "__batch=2"])
    assert _live_keys(spark, path) == list(range(15))
