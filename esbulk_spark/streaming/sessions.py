"""Custom stateful streaming operator: per-key sessionization with
``applyInPandasWithState`` (SURVEY.md §2.C: the reference has no
event-time semantics at all — this is the Spark-native extension the
task calls for, alongside streaming/incremental.py's segment indexer).

Semantics: events of one key sorted by event time; a gap larger than
``gap_sec`` closes the current session. Closed sessions are EMITTED
(append mode); the trailing open session lives in the group state and
survives micro-batch boundaries. Arrival is assumed in order per key
across micro-batches (the file-source + availableNow shape used in
tests); an event older than the open session's last timestamp is folded
into the open session rather than reopening history — the documented
late-data policy (a watermark + EventTimeTimeout variant would close
sessions on watermark advance instead).

At cluster scale this is the standard shuffled-by-key stateful shape:
state volume = one small tuple per ACTIVE key, not per event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),  # epoch seconds
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

SESSION_STATE = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
        StructField("sv", DoubleType()),
    ]
)


def make_sessionizer(gap_sec: int = 1800):
    """Returns the applyInPandasWithState function (key, batches, state)."""
    import pandas as pd

    def fn(key, pdfs, state):
        user_id = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["sec", "event_id"])
        if state.exists:
            start, last, n, sv = state.get
        else:
            start = last = None
            n, sv = 0, 0.0
        out = []
        for sec, val in zip(rows["sec"].values, rows["value"].values):
            sec = int(sec)
            if start is None:
                start, last, n, sv = sec, sec, 1, float(val)
            elif sec - last > gap_sec:
                out.append((user_id, start, last, n, sv))
                start, last, n, sv = sec, sec, 1, float(val)
            else:
                last = max(last, sec)
                n += 1
                sv += float(val)
        state.update((start, last, n, sv))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
            )

    return fn


def sessionize_stream(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """events(user_id, event_id, ts, value) stream -> closed sessions.

    Works on a streaming DataFrame; the caller attaches the sink. The
    ts column is floored to epoch seconds (the same convention as the
    batch sessionize entry, entry_queries.q_sessionize)."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").cast("long").alias("sec"),
        "value",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_sec),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
