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

Crash consistency of the fold (write-then-delete is two steps):

1. On entry, a pending-delete MARKER from a previous crashed fold is
   honored first — the listed dirs are deleted and the marker removed
   (their rows are already in the base: the marker is only written
   AFTER the folded overwrite committed).
2. The folded output is written through ``dropDuplicates()``: if a
   crash in the no-marker window left both the folded base AND the
   original dirs (transient duplicates), the NEXT fold reads the
   duplicated rows and collapses them — re-compaction self-heals, and
   duplicates can never be baked in permanently.  Rows in these tables
   are full-row duplicates by construction (same batch content written
   twice), so full-row dedup is exact.
3. The marker (listing the dirs to delete) is written only after the
   fold's overwrite commits; then the dirs are deleted; then the
   marker is removed.

The remaining exposure is the read-side window between a crash and the
next fold, during which readers can observe duplicated history rows —
callers that cannot tolerate at-least-once semantics there should run
a fold (compact) at ingest-session start, which heals before serving.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MARKER = "_compact_pending.json"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def drop_batch_partition(spark: SparkSession, table_path: str, batch_id: int) -> None:
    """Delete ``<table_path>/__batch=<id>`` if present (idempotent-replay
    support: an at-least-once retry replaces its own partition)."""
    jvm, fs, _ = _fs(spark, table_path)
    part = jvm.org.apache.hadoop.fs.Path(table_path, f"__batch={int(batch_id)}")
    if fs.exists(part):
        fs.delete(part, True)


def _heal_pending(spark: SparkSession, table_path: str) -> None:
    jvm, fs, _ = _fs(spark, table_path)
    marker = jvm.org.apache.hadoop.fs.Path(table_path, _MARKER)
    if not fs.exists(marker):
        return
    stream = fs.open(marker)
    try:
        raw = bytes(stream.readAllBytes())  # java.io.InputStream, JDK 9+
    finally:
        stream.close()
    for name in json.loads(raw.decode()):
        gone = jvm.org.apache.hadoop.fs.Path(table_path, name)
        if fs.exists(gone):
            fs.delete(gone, True)
    fs.delete(marker, False)


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
    only fold once more than this many foldable dirs exist (0 = always).
    """
    jvm, fs, hpath = _fs(spark, table_path)
    if not fs.exists(hpath):
        return
    _heal_pending(spark, table_path)
    keep = {f"__batch={base_batch}"}
    if exclude_batch is not None:
        keep.add(f"__batch={int(exclude_batch)}")
    foldable = [
        st.getPath().getName()
        for st in fs.listStatus(hpath)
        if st.getPath().getName().startswith("__batch=")
        and st.getPath().getName() not in keep
    ]
    if not foldable or len(foldable) < max(int(threshold), 1):
        return
    from .materialize import materialize

    src = spark.read.parquet(table_path)
    if exclude_batch is not None:
        src = src.filter(F.col("__batch") != F.lit(int(exclude_batch)))
    # dropDuplicates: heals transient duplicates from a fold that
    # crashed between overwrite and delete (see module docstring)
    folded = materialize(src.drop("__batch").dropDuplicates())
    (
        folded.withColumn("__batch", F.lit(int(base_batch)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(table_path)
    )
    marker = jvm.org.apache.hadoop.fs.Path(table_path, _MARKER)
    out = fs.create(marker, True)
    try:
        out.write(bytearray(json.dumps(foldable).encode()))
    finally:
        out.close()
    for name in foldable:
        gone = jvm.org.apache.hadoop.fs.Path(table_path, name)
        if fs.exists(gone):
            fs.delete(gone, True)
    fs.delete(marker, False)
