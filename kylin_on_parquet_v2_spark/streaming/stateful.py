"""Custom stateful streaming operators via applyInPandasWithState.

Reference parity: the real-time subsystem's incremental per-key cube state
(``stream-core/.../RecordsAggregator.java``) — our Spark-native equivalent is
arbitrary per-key state kept by the streaming engine across micro-batches,
with Arrow-batched pandas on the hot path (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_total", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("n_batches", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("b", LongType()),
    ]
)


def running_totals(stream: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Per-key running totals maintained across micro-batches (update mode).

    State = (count, sum, batches-seen); each micro-batch emits the updated
    totals for keys present in the batch. The pandas iterator sees Arrow
    batches, never rows.
    """

    def update(key, pdfs, state: GroupState):
        n, s, b = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        b += 1
        state.update((n, s, b))
        import pandas as pd

        # raw sum — rounding happens JVM-side downstream (Python's round is
        # half-even and would diverge from SQL-engine rounding)
        yield pd.DataFrame(
            [{"event_type": key[0], "n_total": n, "sum_value": s, "n_batches": b}]
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
