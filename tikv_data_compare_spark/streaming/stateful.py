"""Custom stateful streaming operators (applyInPandasWithState).

The reference is batch-only; this extends its event surface with the
canonical *stateful* streaming operator a training-data/telemetry pipeline
needs: per-key sessionization whose sessions span micro-batches.

``sessionize_stateful`` keeps ONE open session per key in Spark's state
store (a constant-size tuple — never the event backlog), merges each
arriving Arrow batch into it, and emits a snapshot row per session touched
in the batch.  Closed sessions are final; the open session's latest
snapshot becomes final when the stream ends.  Consumers keep the
highest-``ver`` snapshot per (key, session_idx) — ``latest_snapshots``
does exactly that — which makes re-emission idempotent and the result
equal to the batch lag+cumsum sessionization on the same (time-ordered)
event stream.

Scale shape: state is O(#active keys), not O(#events); each batch group is
processed vectorized in pandas; the only shuffle is the groupBy on the key
— identical to what any stateful aggregation pays.  Late events older than
the open session are counted into it rather than re-opening history
(document the replay contract: feed time-ordered chunks, as a backfill
replay would).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_idx", T.LongType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("min_eid", T.LongType()),
        T.StructField("ver", T.LongType()),
    ]
)


def _out_schema(user_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(user_col, T.LongType()),
            T.StructField("session_idx", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("first_event", T.LongType()),
            T.StructField("ver", T.LongType()),
        ]
    )


def sessionize_stateful(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ms_col: str = "ms",
    id_col: str = "event_id",
    gap_ms: int = 1_800_000,
) -> DataFrame:
    """Streaming per-key sessionization with >gap_ms split (stateful).

    Emits snapshot rows ``(user, session_idx, n_events, duration_ms,
    first_event, ver)``; dedupe with :func:`latest_snapshots`.  Sessions are
    1-indexed per key in event-time order, matching the batch lag+cumsum
    form bit-for-bit under time-ordered replay.
    """
    gap = int(gap_ms)

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:  # defensive: no data for this key in the batch
            yield pd.DataFrame(
                columns=[user_col, "session_idx", "n_events", "duration_ms", "first_event", "ver"]
            )
            return
        rows = rows.sort_values([ms_col, id_col])
        if state.exists:
            sidx, start, last, n, min_eid, ver = state.get
        else:
            sidx, start, last, n, min_eid, ver = 0, None, None, 0, None, 0
        ver += 1
        out = []
        for ms, eid in zip(rows[ms_col].astype("int64"), rows[id_col].astype("int64")):
            ms, eid = int(ms), int(eid)
            if last is None:
                sidx, start, last, n, min_eid = sidx + 1, ms, ms, 1, eid
            elif ms - last > gap:
                # close the open session, then open a new one at this event
                out.append((user, sidx, n, last - start, min_eid, ver))
                sidx, start, last, n, min_eid = sidx + 1, ms, ms, 1, eid
            else:
                last, n, min_eid = max(last, ms), n + 1, min(min_eid, eid)
        # snapshot of the (still open) trailing session
        out.append((user, sidx, n, last - start, min_eid, ver))
        state.update((sidx, start, last, n, min_eid, ver))
        yield pd.DataFrame(
            out,
            columns=[user_col, "session_idx", "n_events", "duration_ms", "first_event", "ver"],
        )

    return (
        stream_df.select(user_col, ms_col, id_col)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=_out_schema(user_col),
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def latest_snapshots(emissions: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Final session rows: the highest-``ver`` snapshot per (key, session)."""
    w = Window.partitionBy(user_col, "session_idx").orderBy(F.desc("ver"))
    return (
        emissions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "ver")
    )
