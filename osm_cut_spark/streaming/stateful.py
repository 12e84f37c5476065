"""Custom stateful streaming operators (applyInPandasWithState).

The reference's mode machine is per-element stateful but single-pass
(SURVEY.md §2.6); Structured Streaming's arbitrary-state API is the
cluster-scale generalization: state lives in the state store keyed by
group, survives microbatch boundaries AND restarts (checkpointed), and
the per-group transition function is an Arrow-batched pandas callable.

``sessionize_stream`` — gap-based sessionization with state carried
ACROSS microbatches: an event arriving in a later batch within
``gap_seconds`` of the group's last event continues the same session
(the property per-batch foreachBatch cannot provide without hand-rolled
state plumbing).  Emits one updated (user_id, n_sessions, n_events) row
per group per batch (Update mode) — downstream sinks upsert on user_id.

Ordering contract: events are sorted by event time within each batch;
cross-batch late data (an event older than the group's last seen time)
extends the current session rather than rewriting history — pair with an
upstream watermark if stricter event-time ordering is required.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, n_sessions BIGINT, n_events BIGINT"
STATE_SCHEMA = "n_sessions BIGINT, n_events BIGINT, last_ts DOUBLE"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful streaming sessionization over an events stream.

    Batch-mode twin for oracle/testing parity: the ``sessionize`` entry
    query (window lag + cumsum) computes identical (n_sessions, n_events)
    when all data arrives in one pass.
    """

    def transition(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            n_sessions, n_events, last_ts = state.get
        else:
            n_sessions, n_events, last_ts = 0, 0, None
        batch = pd.concat(list(pdfs))
        if len(batch):
            # vectorized transition over the sorted event times: a session
            # starts where the gap to the effective previous time exceeds
            # gap_seconds.  The effective previous time is max(carried
            # last_ts, preceding event) — cross-batch late data (t <=
            # carried last_ts) extends the current session, matching the
            # documented ordering contract.
            t = np.sort(batch[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)) / 1e9
            prev = np.concatenate(([-np.inf if last_ts is None else last_ts], t[:-1]))
            if last_ts is not None:
                prev = np.maximum(prev, last_ts)
            n_sessions += int(((t - prev) > gap_seconds).sum())
            n_events += len(t)
            last_ts = float(t[-1]) if last_ts is None else float(max(t[-1], last_ts))
            state.update((int(n_sessions), int(n_events), float(last_ts)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [int(n_sessions)],
                "n_events": [int(n_events)],
            }
        )

    return events.groupBy(user_col).applyInPandasWithState(
        transition,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
