"""Running per-key totals on the transformWithState API (Spark 4) — the
current-generation form of stateful_custom.py's applyInPandasWithState
operator, same semantics (the reference's ``nupdates`` counter generalized,
/root/reference/scrapper.py:197-199), different machinery:

- typed, named state variables (``ValueState``) instead of one opaque tuple;
- state schema evolution, timers, and TTL are first-class;
- requires the RocksDB state store provider (``session conf
  spark.sql.streaming.stateStore.providerClass``), which is also what a
  100 TB deployment runs: state spills to disk per executor instead of
  living on the JVM heap.

Both implementations stay in the package deliberately: applyInPandasWithState
for HDFS-backed-state compatibility, this one as the forward path.

Environment note: the transformWithState Python driver worker speaks protobuf
to the JVM, so the ``protobuf`` package must be installed
(``google.protobuf``); without it the query fails at start with
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. ``tws_available()`` probes
for it; the test suite skips accordingly (this container lacks protobuf).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TWS_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """True when the runtime can execute transformWithState (protobuf
    present for the Python↔JVM state protocol)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, sum) in a named ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            n, total = self._state.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_totals_tws(events, key_col: str = "event_type", value_col: str = "value"):
    """Stream → per-key running (count, sum) via transformWithStateInPandas.
    The session must run the RocksDB state store provider (ROCKSDB_PROVIDER)."""
    keyed = events.selectExpr(f"{key_col} AS key", f"{value_col} AS value")
    return keyed.groupBy("key").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
