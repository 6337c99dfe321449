"""Custom stateful streaming operator: incremental sessionization with
``applyInPandasWithState``.

The batch sessionizer (operators/sessionize.py) needs the whole history
of a conversation; on an unbounded stream that state must live in the
engine.  This operator keeps ONE open session per conversation in Spark's
keyed state store and emits a session row exactly when it closes — either
because a turn arrives after more than ``gap`` of inactivity (the next
session opens), or because the group times out without new data
(processing-time timeout ≈ the inactivity gap, the
``applyInPandasWithState`` idiom for flush-on-idle).

State per key: (session_start_us, last_ts_us, n_turns) — three int64s, so
state size is O(active conversations), not O(turns): the bounded-state
property the reference gets from its prefetch window (SURVEY.md §2 A15).

Semantics match the batch islands for in-order delivery; out-of-order
turns within a batch are sorted before folding, late turns across batches
(earlier than the open session's last ts) count into the open session —
the documented stream-vs-batch divergence (same family as the watermark
drop in streaming/stream.py).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "conv_id string, session_start timestamp, session_end timestamp, "
    "n_turns long, closed_by string"
)

_STATE_SCHEMA = "start_us long, last_us long, n long"


def _fold_sessions(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
    idle_timeout: bool = False,
):
    conv_id = key[0]
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "session_start": pd.to_datetime([start_us], unit="us"),
                "session_end": pd.to_datetime([last_us], unit="us"),
                "n_turns": [n],
                "closed_by": ["timeout"],
            }
        )
        return

    ts_all = pd.concat([p["ts"] for p in pdfs]).sort_values()
    us = ts_all.astype("datetime64[us]").astype("int64").to_numpy()
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = int(us[0]), int(us[0]) - 1, 0

    out_start, out_end, out_n = [], [], []
    for t in us.tolist():
        if n > 0 and t - last_us > gap_us:
            out_start.append(start_us)
            out_end.append(last_us)
            out_n.append(n)
            start_us, n = t, 0
        last_us = max(last_us, t)
        n += 1
    state.update((start_us, last_us, n))
    if idle_timeout:
        # flush-on-idle: close the open session if no new turn arrives
        # within the inactivity gap (processing-time approximation).
        # NOTE: a query with registered processing-time timeouts does not
        # self-terminate under trigger(availableNow) — use only with
        # continuous triggers.
        state.setTimeoutDuration(max(gap_us // 1000, 1))

    if out_n:
        yield pd.DataFrame(
            {
                "conv_id": [conv_id] * len(out_n),
                "session_start": pd.to_datetime(out_start, unit="us"),
                "session_end": pd.to_datetime(out_end, unit="us"),
                "n_turns": out_n,
                "closed_by": ["gap"] * len(out_n),
            }
        )


def streaming_sessionize(
    stream: DataFrame,
    gap: str = "30 minutes",
    key: str = "conv_id",
    idle_timeout: bool = False,
) -> DataFrame:
    """Unbounded-stream sessionization: one output row per CLOSED session
    (append-mode friendly), state bounded by active conversations."""
    # pandas parses the same interval vocabulary Spark does ("30 minutes",
    # "1 day", "90 seconds", ...) — keeps this operator's gap strings
    # interchangeable with the batch sessionizer's
    try:
        gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
    except ValueError as exc:
        raise ValueError(f"unparseable gap interval {gap!r}") from exc
    if gap_us <= 0:
        raise ValueError(f"gap must be positive, got {gap!r}")

    def fold(key_, pdfs, state):
        yield from _fold_sessions(key_, pdfs, state, gap_us, idle_timeout)

    return (
        stream.select(key, "ts")
        .withColumnRenamed(key, "conv_id")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
