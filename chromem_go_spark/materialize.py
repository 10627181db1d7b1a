"""Materialization policy: how reused/iterated subtrees cut lineage.

Operators here (prefix-filtered similarity joins, LSH bucket tables,
connected-components iterations, bucketed-table self-overwrites) need a
computed-once intermediate. Locally, ``localCheckpoint`` is the right
primitive — fast, no filesystem round-trip. On a 1000-executor cluster
it is NOT fault-tolerant: blocks live only on executors, so one lost
executor kills the whole job mid-iteration.

``materialize(df)`` is the single switch point. By default it
``localCheckpoint``s; after :func:`enable_reliable_checkpoints` it uses
``df.checkpoint()`` against a durable checkpoint dir (HDFS/S3 on a real
deployment), which survives executor loss. Every operator in the repo
routes its lineage cuts through here, so cluster deployments flip ONE
knob instead of auditing call sites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_RELIABLE_DIR: str | None = None


def enable_reliable_checkpoints(spark: SparkSession, checkpoint_dir: str) -> None:
    """Route all lineage cuts through fault-tolerant ``df.checkpoint()``
    into ``checkpoint_dir`` (an HDFS/S3/shared path on a cluster)."""
    global _RELIABLE_DIR
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    _RELIABLE_DIR = checkpoint_dir


def disable_reliable_checkpoints() -> None:
    """Back to executor-local checkpoints (the local-mode default)."""
    global _RELIABLE_DIR
    _RELIABLE_DIR = None


def reliable_checkpoint_dir() -> str | None:
    return _RELIABLE_DIR


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Compute ``df`` once and cut its lineage.

    ``eager=False`` (r15) defers the computation to the FIRST downstream
    job instead of launching a dedicated one — the plan boundary (Scan
    ExistingRDD) exists either way, so optimizer behavior is identical;
    only the extra job barrier disappears.  Safe ONLY when the first
    downstream consumer references the frame ONCE in its plan (a lazy
    checkpoint referenced twice in one job computes its partitions in
    racing tasks and may double-compute); later multi-branch consumers
    are fine because the first job has already populated the blocks.
    """
    if _RELIABLE_DIR is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
