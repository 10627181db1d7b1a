"""Arbitrary stateful streaming via the transformWithStateInPandas API
(the successor to applyInPandasWithState: typed state variables, timers,
RocksDB-backed state store).

NOTE: the transformWithState Python state protocol requires the
``protobuf`` package at runtime; this container does not ship it, so the
operator is exercised only where protobuf is available (test is
import-gated). ``streaming/ingest.running_user_stats`` covers the same
need on the applyInPandasWithState API with no extra dependency.

Operator here: per-user high-water mark — emits a row whenever a user's
running maximum event value rises. The state is one ValueState double
per user (O(active users), RocksDB-spillable), the pattern any
"running extremum / threshold crossing" monitor follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

HWM_OUTPUT_SCHEMA = "user_id bigint, hwm double"


class UserHighWaterMark(StatefulProcessor):
    """Tracks max(value) per user across micro-batches; emits the new
    high-water mark whenever it rises."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._hwm = handle.getValueState("hwm", "mx double")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        prev = self._hwm.get()[0] if self._hwm.exists() else None
        mx = prev
        for pdf in rows:
            if len(pdf):
                batch_max = float(pdf["value"].max())
                mx = batch_max if mx is None else max(mx, batch_max)
        if mx is not None and (prev is None or mx > prev):
            self._hwm.update((mx,))
            yield pd.DataFrame({"user_id": [key[0]], "hwm": [mx]})

    def close(self) -> None:
        pass


def user_high_water_mark(events: DataFrame) -> DataFrame:
    """Apply the high-water-mark processor per user_id. Works on
    streaming DataFrames (requires the RocksDB state store provider,
    see ``rocksdb_conf``)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserHighWaterMark(),
            outputStructType=HWM_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_conf(spark) -> None:
    """transformWithState requires the RocksDB state store provider."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
