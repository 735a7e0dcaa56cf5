"""Event-stream operators over the events table: sessionization and
tumbling-window aggregation.

Not present in the reference (it has no streaming/windowed execution —
SURVEY.md §7.5); added as first-class training-data-pipeline operators.
Both are batch operators over a bounded table — no watermarks:

* ``sessionize``: classic gap-based sessions per user. Shuffle shape:
  ``groupby(user_id)`` (each user's events fit a group by assumption; hot
  users would be split by day first — documented, not needed at test scale),
  then a vectorized gap scan inside the group.
* ``tumbling_window``: pure ``map_batches`` key assignment + groupby
  aggregate — the shuffle moves only (window, partial) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def sessionize(ds, gap_seconds: float = 1800.0):
    """Events -> one row per session:
    (user_id, session_seq, n_events, start_ts, end_ts, duration_s, sum_value).

    session_seq numbers a user's sessions in time order (0-based);
    a new session starts when the gap from the previous event exceeds
    ``gap_seconds``.
    """

    gap_us = int(gap_seconds * 1_000_000)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        # integer microseconds throughout: timestamps stay exact, so session
        # boundaries and durations are bit-stable and SQL-oracle-checkable
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gaps = np.diff(ts, prepend=ts[0])
        sid = np.cumsum(gaps > gap_us)
        out = []
        for s in np.unique(sid):
            m = sid == s
            out.append(
                {
                    "user_id": int(g["user_id"].iloc[0]),
                    "session_seq": int(s),
                    "n_events": int(m.sum()),
                    "start_us": int(ts[m].min()),
                    "end_us": int(ts[m].max()),
                    "duration_us": int(ts[m].max() - ts[m].min()),
                    "sum_value": float(g["value"].to_numpy()[m].sum()),
                }
            )
        return pd.DataFrame(out)

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def tumbling_window(ds, window_seconds: int = 3600):
    """Events -> per (window, event_type) aggregate:
    (window_start, event_type, n_events, sum_value).

    window_start = epoch seconds floored to the window. Key assignment is a
    vectorized map; the groupby moves only small aggregate rows after a
    per-batch partial aggregation."""

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy() // 1_000_000
        win = (ts // window_seconds) * window_seconds
        t = batch.append_column("window_start", pa.array(win, pa.int64()))
        # partial per-batch aggregation before the shuffle
        df = t.select(["window_start", "event_type", "value"]).to_pandas()
        agg = df.groupby(["window_start", "event_type"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = ds.map_batches(assign, batch_format="pyarrow")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_start": [int(g["window_start"].iloc[0])],
                "event_type": [g["event_type"].iloc[0]],
                "n_events": [int(g["n_events"].sum())],
                "sum_value": [float(g["sum_value"].sum())],
            }
        )

    return partials.groupby(["window_start", "event_type"]).map_groups(
        combine, batch_format="pandas"
    )
