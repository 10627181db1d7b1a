"""to_instant: timestamp-encoding normalization over every encoding the
driver's events.parquet has shipped (bigint nanos, timestamp_ntz,
timestamp LTZ) — the r3 regression was exactly a writer-side encoding
flip that only the oracle caught."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from chromem_go_spark.functions.time import to_instant

EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z


def _check(df, spark):
    out = to_instant(df, "ts")
    assert dict(out.dtypes)["ts"] == "timestamp"
    # The instant must be the same wall-clock-in-UTC second regardless
    # of the input encoding.
    secs = out.select(F.col("ts").cast("double").alias("s")).head()["s"]
    assert secs == pytest.approx(EPOCH_US / 1e6)


def test_bigint_nanos(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame(
        [(EPOCH_US * 1000,)],
        StructType([StructField("ts", LongType())]),
    )
    _check(df, spark)


def test_timestamp_ntz(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame(
        [(datetime.datetime.utcfromtimestamp(EPOCH_US / 1e6),)],
        StructType([StructField("ts", TimestampNTZType())]),
    )
    _check(df, spark)


def test_timestamp_ltz_passthrough(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame(
        [(datetime.datetime.utcfromtimestamp(EPOCH_US / 1e6),)],
        StructType([StructField("ts", TimestampType())]),
    )
    out = to_instant(df, "ts")
    # Already LTZ: same plan object back, no extra projection.
    assert out is df
    _check(df, spark)


def test_missing_column_raises(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="no column"):
        to_instant(df, "ts")


def test_unsupported_type_raises(spark):
    df = spark.range(1).select(F.lit(1.5).alias("ts"))  # double: ambiguous unit
    with pytest.raises(ValueError, match="cannot normalize"):
        to_instant(df, "ts")


def test_string_and_date_inputs(spark):
    """ISO-string and date ts columns normalize instead of raising —
    F.window used to cast these implicitly, and batch callers of the
    streaming ops still hand them in."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame([("2023-11-14 22:13:20",)], "ts string")
    out = to_instant(df, "ts")
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.head()["ts"].year == 2023
    dd = spark.createDataFrame([(datetime.date(2023, 11, 14),)], "ts date")
    assert dict(to_instant(dd, "ts").dtypes)["ts"] == "timestamp"


def test_unparseable_string_fails_loudly(spark):
    """Bad timestamp strings must raise at execution, not silently
    become NULL and corrupt every downstream window. Under ANSI mode
    (Spark 4 default) the cast itself raises CAST_INVALID_INPUT; with
    ANSI off, to_instant's own raise_error guard fires — loud either
    way."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame([("not-a-time",)], "ts string")
    out = to_instant(df, "ts")
    with pytest.raises(
        Exception, match="unparseable timestamp string|CAST_INVALID_INPUT"
    ):
        out.collect()
    # and with ANSI off, the explicit guard is load-bearing
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="unparseable timestamp string"):
            to_instant(df, "ts").collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")
