"""Table-format transaction backend for persistent collections.

The plain-Parquet persistence layer serializes writers with a
pessimistic lock file (locking.py) around a read-merge-write — correct
on POSIX/NFSv4/HDFS, but on S3-class object stores neither the lock's
``O_CREAT|O_EXCL`` nor the dynamic-partition-overwrite commit is
atomic.  The lakehouse answer is a table format whose commit protocol
IS atomic on object stores: Delta Lake's optimistic transaction log
(a MERGE/DELETE commits by writing one new JSON action file; conflicts
are detected and retried).  This module is that backend:

- :func:`delta_available` — runtime detection: the ``delta-spark``
  Python bindings AND the Delta jars on the session classpath.  Both
  are required; this container ships neither, so everything here is
  import-gated and exercised by skip-marked tests that run where Delta
  is installed (``pip install delta-spark`` + the documented
  ``spark.sql.extensions`` / catalog configs).
- :func:`merge_upsert` — last-writer-wins upsert by id as a native
  ``MERGE INTO`` (reference semantics: upsert-by-ID map assignment,
  reference collection.go:280).
- :func:`delete_where` — predicate delete as a native ``DELETE``.

Collection wires these behind ``table_format="delta"``; the lock-file
path remains the plain-parquet fallback, and the choice is recorded in
collection.json so reopening a collection picks the right reader.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

MISSING_DELTA_ERROR = (
    "table_format='delta' requires the delta-spark package and the "
    "Delta Lake jars on the Spark classpath (configure the session with "
    "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension and "
    "spark.sql.catalog.spark_catalog="
    "org.apache.spark.sql.delta.catalog.DeltaCatalog)"
)


def delta_available(spark: SparkSession) -> bool:
    """True iff Delta Lake is usable in this session: the Python
    bindings import AND the JVM can load the DeltaTable class (py4j
    members resolve lazily, so the only honest check is an actual
    ``Class.forName`` — never ``hasattr`` on a JavaObject)."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError:
        return False
    try:
        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:
        return False


def require_delta(spark: SparkSession) -> None:
    if not delta_available(spark):
        raise RuntimeError(MISSING_DELTA_ERROR)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("delta").load(path)


def table_exists(spark: SparkSession, path: str) -> bool:
    from delta.tables import DeltaTable

    return DeltaTable.isDeltaTable(spark, path)


def _create_table(updates: DataFrame, path: str) -> None:
    """First-write table creation — isolated so the conformance suite
    (tests/test_tablefmt.py, parquet-backed DeltaTable double) can
    execute the MERGE/DELETE protocol below without the Delta jars."""
    updates.write.format("delta").mode("append").save(path)


def merge_upsert(
    spark: SparkSession, path: str, updates: DataFrame, key_col: str = "id"
) -> None:
    """Upsert ``updates`` into the Delta table at ``path`` by
    ``key_col``: one atomic MERGE commit (WHEN MATCHED UPDATE ALL /
    WHEN NOT MATCHED INSERT ALL).  Creates the table on first write.

    Duplicate keys WITHIN one batch are collapsed to an arbitrary
    winner first (MERGE rejects multi-row source matches); that matches
    the parquet path, whose last-writer-wins window breaks same-batch
    ties arbitrarily too.  Concurrency comes from Delta's optimistic
    commit protocol — no lock file."""
    from delta.tables import DeltaTable

    updates = updates.dropDuplicates([key_col])
    if not DeltaTable.isDeltaTable(spark, path):
        _create_table(updates, path)
        return
    (
        DeltaTable.forPath(spark, path)
        .alias("t")
        .merge(updates.alias("s"), f"t.{key_col} = s.{key_col}")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def delete_where(spark: SparkSession, path: str, condition: Column) -> None:
    """Native ``DELETE FROM <path> WHERE condition`` — one atomic
    commit, no read-merge-write, no lock."""
    from delta.tables import DeltaTable

    if not DeltaTable.isDeltaTable(spark, path):
        return
    DeltaTable.forPath(spark, path).delete(condition)
