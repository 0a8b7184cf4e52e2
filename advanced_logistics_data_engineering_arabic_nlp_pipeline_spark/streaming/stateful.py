"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2 L: the escape hatch for operators Structured Streaming's
built-in windows can't express).

``running_user_totals`` keeps (n_events, total_value, last_ts) per user in
GroupState and emits an updated snapshot row per user per micro-batch —
state survives across availableNow restarts through the checkpoint, which
is exactly the capability the reference's pickle-based resume approximated
(Main.py:109-163).

Design notes for scale: state is per-key and lives in the state store
(RocksDB-backed on a real cluster); the Arrow batches keep the Python
boundary vectorized; timeouts would evict idle users (NoTimeout here since
the fixture replay is finite).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    # store the UNROUNDED total; round only the emitted snapshot. Rounding
    # the stored state discards any per-batch increment below 5e-7 forever
    # (round(prev + 4e-7, 6) == prev) and compounds error across batches,
    # drifting from the exact-decimal dsum batch twin.
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) snapshots, one row per user per batch."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
