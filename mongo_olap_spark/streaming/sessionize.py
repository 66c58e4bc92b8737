"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the engine's demonstration of the
arbitrary-stateful API — SURVEY.md §2.2 streaming surface).

Spark's native ``session_window`` aggregation covers windowed aggs of
session scope; this operator exists for session *semantics the native
aggregate can't express* (emit one row per closed session with
arbitrary per-session state — first/last payloads, running decimals,
custom merge rules) and as the template for any custom stateful op.

Semantics (batch twin: queries/misc.q_sessionize):

- events of one key arriving within ``gap`` of the previous event
  extend the open session;
- a gap strictly greater than ``gap`` closes the session;
- closed sessions are emitted in append mode; the open session lives
  in the state store and is flushed by an **event-time timeout** once
  the watermark passes ``session_end + gap`` — late data beyond the
  watermark is dropped by Spark before reaching the operator, so an
  emitted session is final (exactly-once per session).

State is kept in integer microseconds + decimals-as-float; one state
row per key, O(|active keys|) store size, RocksDB-capable (see
tests/test_streaming.py RocksDB smoke).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: output schema of closed sessions
OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, session_value double"
)
#: per-key open-session state: micros bounds + running aggregates
STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint, v double"


def streaming_sessionize(
    stream: DataFrame,
    *,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Closed (session_start, session_end, n_events, session_value)
    rows per key from a raw event stream."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        if state.hasTimedOut:
            # watermark passed end + gap: the open session is final
            start_us, end_us, n, v = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "session_value": [v],
                }
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows["_us"] = rows[ts_col].astype("int64") // 1000  # ns → µs
        rows = rows.sort_values("_us")
        cur = state.get if state.exists else None  # (start, end, n, v)
        closed: list[tuple] = []
        for us, val in zip(rows["_us"].to_numpy(), rows[value_col].to_numpy()):
            if cur is None:
                cur = (int(us), int(us), 1, float(val))
            elif us - cur[1] > gap_us:
                closed.append(cur)
                cur = (int(us), int(us), 1, float(val))
            else:
                cur = (cur[0], int(us), cur[2] + 1, cur[3] + float(val))
        state.update(cur)
        # flush the open session when the watermark clears end + gap
        state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "session_value": [c[3] for c in closed],
                }
            )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
