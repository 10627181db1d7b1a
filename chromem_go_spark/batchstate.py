"""Shared protocol for append-partitioned tables (``__batch=N`` dirs).

Incremental surfaces persist micro-batch output as one partition per
batch id — the near-dup state tables (streaming/ingest.py) and the
appendable ANN indexes (operators/ann.py).  This module owns the two
filesystem-level operations they share, through the Hadoop FileSystem
API so the same code runs on local dirs and object stores:

- :func:`drop_batch_partition` — replay idempotence: a foreachBatch
  retry deletes its own partition before re-writing it;
- :func:`fold_batch_partitions` — compaction: fold history partitions
  into the reserved base partition so the dir count stays bounded.

Crash consistency of the fold — stage-then-promote, never overwriting
live data:

1. The folded rows (everything foldable + the current base, deduped)
   are first written to a STAGING partition (``__batch=-2``); source
   dirs are untouched, so a crash here costs nothing but a stale
   staging dir (cleared, and its duplicate rows collapsed by
   ``dropDuplicates``, on the next fold).
2. A MARKER recording {delete: [...], stage: ...} is committed by
   write-to-temp + atomic rename — a half-written marker can never be
   observed.
3. Only then are the source dirs (including the old base) deleted and
   the staging dir renamed to the base.  A crash anywhere in step 3 is
   healed by :func:`_heal_pending` on the next fold: finish the
   deletes, finish the rename, drop the marker.

The base partition is therefore never deleted before a complete,
committed replacement exists.  Readers between a crash and the next
fold can transiently observe duplicated history rows (at-least-once);
callers that cannot tolerate that should fold at session start.
Directory rename is atomic on POSIX/HDFS; on S3-style stores front
this with a rename-capable layer or table format.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_MARKER = "_compact_pending.json"
_STAGE_BATCH = -2  # reserved staging id; never a valid caller batch


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def drop_batch_partition(spark: SparkSession, table_path: str, batch_id: int) -> None:
    """Delete ``<table_path>/__batch=<id>`` if present (idempotent-replay
    support: an at-least-once retry replaces its own partition).

    Negative ids are reserved (base = caller-chosen, conventionally -1;
    staging = -2): letting a caller "replay" one of those would silently
    delete the whole compacted base index, so it's a hard error."""
    if int(batch_id) < 0:
        raise ValueError(
            f"batch_id must be >= 0 (got {batch_id}): negative ids are "
            "reserved for the compacted base (-1) and staging (-2) "
            "partitions; dropping them would destroy the index"
        )
    jvm, fs, _ = _fs(spark, table_path)
    part = jvm.org.apache.hadoop.fs.Path(table_path, f"__batch={int(batch_id)}")
    if fs.exists(part):
        fs.delete(part, True)


def _heal_pending(spark: SparkSession, table_path: str, base_batch: int) -> None:
    """Finish a fold that crashed after committing its marker: delete
    the listed source dirs, promote the staging dir to the base, drop
    the marker.  An unparseable marker (can only be a pre-atomic-rename
    artifact of an old version, or manual damage) is discarded — the
    no-marker crash window is already healed by dedup-on-fold."""
    jvm, fs, _ = _fs(spark, table_path)
    marker = jvm.org.apache.hadoop.fs.Path(table_path, _MARKER)
    if not fs.exists(marker):
        return
    stream = fs.open(marker)
    try:
        raw = bytes(stream.readAllBytes())  # java.io.InputStream, JDK 9+
    finally:
        stream.close()
    try:
        plan = json.loads(raw.decode())
        deletes, stage = plan["delete"], plan["stage"]
    except (ValueError, KeyError, TypeError, UnicodeDecodeError):
        fs.delete(marker, False)
        return
    stage_path = jvm.org.apache.hadoop.fs.Path(table_path, stage)
    if fs.exists(stage_path):
        for name in deletes:
            gone = jvm.org.apache.hadoop.fs.Path(table_path, name)
            if fs.exists(gone) and not fs.delete(gone, True):
                raise IOError(f"heal: could not delete {name} under {table_path}")
        if not fs.rename(
            stage_path,
            jvm.org.apache.hadoop.fs.Path(table_path, f"__batch={base_batch}"),
        ):
            # Hadoop rename reports failure as False, not an exception.
            # Keep the marker so the next fold retries the promote —
            # deleting it here would strand the folded rows in staging.
            raise IOError(
                f"heal: could not promote {stage} to __batch={base_batch} "
                f"under {table_path}"
            )
    fs.delete(marker, False)


def _write_marker(spark: SparkSession, table_path: str, payload: dict) -> None:
    """Commit the marker atomically: write a temp file, then rename —
    a crash mid-write leaves only the temp, never a partial marker."""
    jvm, fs, _ = _fs(spark, table_path)
    tmp = jvm.org.apache.hadoop.fs.Path(table_path, _MARKER + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(payload).encode()))
    finally:
        out.close()
    if not fs.rename(tmp, jvm.org.apache.hadoop.fs.Path(table_path, _MARKER)):
        raise IOError(f"could not commit marker {_MARKER} under {table_path}")


def fold_batch_partitions(
    spark: SparkSession,
    table_path: str,
    partition_cols: list,
    base_batch: int,
    exclude_batch: int | None = None,
    threshold: int = 0,
) -> None:
    """Fold history ``__batch=N`` partitions into ``__batch=<base_batch>``.

    ``exclude_batch``: a CURRENT batch to leave untouched (its
    replay-overwrite contract must survive compaction).  ``threshold``:
    fold only when at least this many foldable dirs exist (0/1 = fold
    whenever there is anything to fold).
    """
    jvm, fs, hpath = _fs(spark, table_path)
    if not fs.exists(hpath):
        return
    _heal_pending(spark, table_path, base_batch)
    keep = {f"__batch={base_batch}", f"__batch={_STAGE_BATCH}"}
    if exclude_batch is not None:
        keep.add(f"__batch={int(exclude_batch)}")
    foldable = [
        st.getPath().getName()
        for st in fs.listStatus(hpath)
        if st.getPath().getName().startswith("__batch=")
        and st.getPath().getName() not in keep
    ]
    if len(foldable) < max(int(threshold), 1):
        return
    from .materialize import materialize

    src = spark.read.parquet(table_path)
    if exclude_batch is not None:
        src = src.filter(F.col("__batch") != F.lit(int(exclude_batch)))
    # dedup: collapses duplicate rows left by a crash in the no-marker
    # window (stale staging dir, or base written twice by old versions)
    folded = materialize(src.drop("__batch").dropDuplicates())
    # source dirs are safe to read from now on: folded is pinned
    stage_name = f"__batch={_STAGE_BATCH}"
    stage_path = jvm.org.apache.hadoop.fs.Path(table_path, stage_name)
    if fs.exists(stage_path):  # stale staging from a pre-marker crash
        fs.delete(stage_path, True)
    (
        folded.withColumn("__batch", F.lit(_STAGE_BATCH))
        .write.mode("append")
        .partitionBy(*partition_cols)
        .parquet(table_path)
    )
    base_name = f"__batch={base_batch}"
    deletes = sorted(set(foldable) | {base_name})
    _write_marker(spark, table_path, {"delete": deletes, "stage": stage_name})
    for name in deletes:
        gone = jvm.org.apache.hadoop.fs.Path(table_path, name)
        if fs.exists(gone) and not fs.delete(gone, True):
            raise IOError(f"fold: could not delete {name} under {table_path}")
    if not fs.rename(
        stage_path, jvm.org.apache.hadoop.fs.Path(table_path, base_name)
    ):
        # Marker stays: the next fold's _heal_pending retries the promote
        # instead of the folded rows silently stranding in staging.
        raise IOError(
            f"fold: could not promote {stage_name} to {base_name} "
            f"under {table_path}"
        )
    fs.delete(jvm.org.apache.hadoop.fs.Path(table_path, _MARKER), False)
