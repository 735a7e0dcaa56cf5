"""Event-stream analytics: retention cohorts and ordered-funnel counts.

Not present in the reference (no event/streaming surface — SURVEY.md §7.5);
added as first-class training-data / product-analytics operators over the
events table. Both follow the repo-wide skew-safe shape:

* a **per-batch distinct/partial combiner** runs before the shuffle, so
  the exchange carries distinct (user, day) pairs or per-step survivor
  rows — never raw events;
* the shuffle lands in a fixed number of COARSE groups keyed by
  ``user_id`` (every user fully co-located, many users per group), and the
  per-group work is one vectorized numpy pass — no per-user Python calls;
* the final reduction is a tiny ``groupby().sum()`` over partial counts.

Integer day/microsecond arithmetic throughout, so both operators are
bit-exact against their DuckDB SQL oracles and parallelism-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_DAY_US = 86_400_000_000
_NGROUPS = 256


def retention_cohorts(ds, user_col: str = "user_id", ts_col: str = "ts"):
    """Classic cohort-retention table: one row per
    (cohort_day, day_offset) with the number of users from that cohort
    active ``day_offset`` days after their first-ever event.

    ``cohort_day`` is the user's first active day (integer days since
    epoch); a user contributes one count per DISTINCT active day.

    Scale shape: batches reduce to distinct (user, day) pairs before the
    shuffle; users hash into coarse groups (a user's whole history is tiny
    — bounded by days, not events); per-group numpy computes first-day +
    offsets + partial (cohort, offset) counts; a final small groupby sums
    partials.
    """

    def distinct_pairs(b: pa.Table) -> pa.Table:
        ts = b.column(ts_col).cast(pa.int64()).to_numpy()
        uid = b.column(user_col).to_numpy()
        day = ts // _DAY_US
        pairs = np.unique(np.stack([uid, day], axis=1), axis=0)
        return pa.table(
            {
                "ckey": pa.array(pairs[:, 0] % _NGROUPS, pa.int64()),
                "user_id": pa.array(pairs[:, 0], pa.int64()),
                "day": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        # cross-block dedup of (user, day), then first-day per user via
        # run starts on the sorted pair list
        pairs = np.unique(
            np.stack([g["user_id"].to_numpy(), g["day"].to_numpy()], axis=1),
            axis=0,
        )
        uid, day = pairs[:, 0], pairs[:, 1]
        starts = np.r_[0, 1 + np.flatnonzero(uid[1:] != uid[:-1])]
        counts = np.diff(np.r_[starts, len(uid)])
        cohort = np.repeat(day[starts], counts)
        co = np.unique(
            np.stack([cohort, day - cohort], axis=1),
            axis=0,
            return_counts=True,
        )
        return pd.DataFrame(
            {
                "cohort_day": co[0][:, 0],
                "day_offset": co[0][:, 1],
                "n_users": co[1].astype(np.int64),
            }
        )

    partials = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("ckey")
        .map_groups(per_group, batch_format="pandas")
    )
    return partials.groupby(["cohort_day", "day_offset"]).sum("n_users")


def funnel_counts(
    ds,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Ordered-funnel conversion: for each step i, the number of users with
    a strictly-increasing timestamp chain ``t_1 < t_2 < ... < t_i`` through
    the first i step event types (the standard product-analytics funnel:
    each step must happen strictly AFTER the user's earliest completion of
    the previous step).

    Returns one row per step: (step 1-based, step_name, n_users).

    Scale shape: only events of the funnel's types leave the read (3 of N
    event types); rows shuffle once into user-keyed coarse groups; the
    per-group pass is a fixed small loop over steps with
    ``np.minimum.at`` per-user mins — no per-user Python.
    """
    steps = tuple(steps)
    if len(steps) < 1:
        raise ValueError("funnel_counts: need at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel_counts: steps must be distinct")
    step_idx = {s: i for i, s in enumerate(steps)}

    def project(b: pa.Table) -> pa.Table:
        et = b.column(type_col).to_numpy(zero_copy_only=False)
        sel = np.isin(et, list(steps))
        uid = b.column(user_col).to_numpy()[sel]
        ts = b.column(ts_col).cast(pa.int64()).to_numpy()[sel]
        si = np.array([step_idx[s] for s in et[sel]], dtype=np.int64)
        return pa.table(
            {
                "ckey": pa.array(uid % _NGROUPS, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "si": pa.array(si, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
            }
        )

    nsteps = len(steps)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        si = g["si"].to_numpy()
        ts = g["ts_us"].to_numpy()
        uniq, u = np.unique(uid, return_inverse=True)
        nu = len(uniq)
        prev = np.full(nu, -np.inf)
        out = np.zeros(nsteps, dtype=np.int64)
        for i in range(nsteps):
            sel = si == i
            cur = np.full(nu, np.inf)
            tt = ts[sel].astype(np.float64)
            us = u[sel]
            ok = tt > prev[us]
            np.minimum.at(cur, us[ok], tt[ok])
            out[i] = int(np.isfinite(cur).sum())
            prev = cur
        return pd.DataFrame(
            {
                "step": np.arange(1, nsteps + 1, dtype=np.int64),
                "step_name": list(steps),
                "n_users": out,
            }
        )

    partials = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("ckey")
        .map_groups(per_group, batch_format="pandas")
    )
    return partials.groupby(["step", "step_name"]).sum("n_users")


def event_gaps(ds, user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id"):
    """Inter-event-gap statistics per user: (user_id, n_gaps, sum_gap_us,
    max_gap_us, min_gap_us) over consecutive events in (ts, event_id)
    order. Users with fewer than two events are omitted (they have no
    gaps). Integer microseconds — bit-exact vs the SQL LAG oracle.

    Scale shape: the shuffle carries (user, ts, id) triples into user-keyed
    coarse groups (one hot user still lands in one group — bounded by that
    user's event count, the same exposure as SQL's PARTITION BY; the
    sessionize (user, day) subkey trick is the mitigation when per-user
    history exceeds a group); the per-group pass is one sort + one diff
    with reduceat segment reductions.
    """

    def project(b: pa.Table) -> pa.Table:
        uid = b.column(user_col).to_numpy()
        ts = b.column(ts_col).cast(pa.int64()).to_numpy()
        eid = b.column(id_col).to_numpy()
        return pa.table(
            {
                "ckey": pa.array(uid % _NGROUPS, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "eid": pa.array(eid, pa.int64()),
            }
        )

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "eid"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        gaps = np.diff(ts, prepend=ts[0] if len(ts) else 0)
        newu = np.r_[True, uid[1:] != uid[:-1]]
        valid = ~newu  # a gap exists only within a user run
        vu = uid[valid]
        vg = gaps[valid]
        if len(vu) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "n_gaps": pd.Series([], dtype=np.int64),
                    "sum_gap_us": pd.Series([], dtype=np.int64),
                    "max_gap_us": pd.Series([], dtype=np.int64),
                    "min_gap_us": pd.Series([], dtype=np.int64),
                }
            )
        starts = np.r_[0, 1 + np.flatnonzero(vu[1:] != vu[:-1])]
        return pd.DataFrame(
            {
                "user_id": vu[starts],
                "n_gaps": np.diff(np.r_[starts, len(vu)]).astype(np.int64),
                "sum_gap_us": np.add.reduceat(vg, starts),
                "max_gap_us": np.maximum.reduceat(vg, starts),
                "min_gap_us": np.minimum.reduceat(vg, starts),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("ckey")
        .map_groups(per_group, batch_format="pandas")
    )


def event_transitions(ds, user_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id",
                      type_col: str = "event_type"):
    """Markov transition counts between consecutive event types per user:
    one row per (prev_type, next_type) with the total count over all
    users — the sequence-statistics primitive behind session modeling.

    Order within a user is (ts, event_id). Scale shape = event_gaps: one
    user-keyed coarse-group shuffle of (user, ts, id, type) rows, then a
    vectorized sort + shift per group, per-group pair-count partials, and
    a tiny final groupby-sum."""

    def project(b: pa.Table) -> pa.Table:
        uid = b.column(user_col).to_numpy()
        ts = b.column(ts_col).cast(pa.int64()).to_numpy()
        eid = b.column(id_col).to_numpy()
        return pa.table(
            {
                "ckey": pa.array(uid % _NGROUPS, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "eid": pa.array(eid, pa.int64()),
                "etype": b.column(type_col),
            }
        )

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "eid"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["etype"].to_numpy()
        if len(uid) == 0:
            same = np.zeros(0, dtype=bool)
        else:
            same = np.r_[False, uid[1:] == uid[:-1]]
        prev = np.r_[[""], et[:-1]][same]
        nxt = et[same]
        if len(nxt) == 0:
            return pd.DataFrame(
                {
                    "prev_type": pd.Series([], dtype=object),
                    "next_type": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        pairs = np.stack([prev.astype(str), nxt.astype(str)], axis=1)
        uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pd.DataFrame(
            {
                "prev_type": uniq[:, 0],
                "next_type": uniq[:, 1],
                "n": cnt.astype(np.int64),
            }
        )

    partials = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("ckey")
        .map_groups(per_group, batch_format="pandas")
    )
    return partials.groupby(["prev_type", "next_type"]).sum("n")

def moving_avg(ds, window: int = 3, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               value_col: str = "value"):
    """Per-user ROWS-window moving average: for each event, the mean of the
    current and the previous ``window - 1`` values in (ts, event_id) order
    — the ``AVG(...) OVER (PARTITION BY user ORDER BY ts ROWS BETWEEN k
    PRECEDING AND CURRENT ROW)`` shape.

    Bit-exactness: values quantize to integer cents (floor(v*100 + 0.5) —
    the same expression the oracle uses, avoiding the numpy-banker's vs
    SQL-away-from-zero ROUND divergence); window sums are exact int64; the
    single final division by the window count is one IEEE op both sides.

    Scale shape: ONE shuffle of (user, ts, id, cents) rows into user-keyed
    coarse groups; per group one mergesort + a windowed prefix-sum
    difference (no per-row Python). Same hot-user exposure as SQL's
    PARTITION BY; the sessionize (user, day) subkey trick applies if a
    single user's history outgrows a group.
    """

    def project(b: pa.Table) -> pa.Table:
        uid = b.column(user_col).to_numpy()
        ts = b.column(ts_col).cast(pa.int64()).to_numpy()
        eid = b.column(id_col).to_numpy()
        val = b.column(value_col).to_numpy()
        cents = np.floor(val * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "ckey": pa.array(uid % _NGROUPS, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        cents = g["cents"].to_numpy()
        n = len(uid)
        if n == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "ts_us": pd.Series([], dtype=np.int64),
                    "mavg": pd.Series([], dtype=np.float64),
                }
            )
        seg_start = np.zeros(n, dtype=np.int64)
        new = np.r_[True, uid[1:] != uid[:-1]]
        seg_start[new] = np.flatnonzero(new)
        seg_start = np.maximum.accumulate(seg_start)
        idx = np.arange(n)
        lo = np.maximum(seg_start, idx - (window - 1))
        cs = np.concatenate(([0], np.cumsum(cents)))
        wsum = cs[idx + 1] - cs[lo]
        wcnt = idx + 1 - lo
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": uid,
                "ts_us": ts,
                "mavg": (wsum / 100.0) / wcnt,
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("ckey")
        .map_groups(per_group, batch_format="pandas")
    )
