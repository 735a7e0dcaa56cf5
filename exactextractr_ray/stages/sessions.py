"""Event-stream operators over the events table: sessionization and
tumbling-window aggregation.

Not present in the reference (it has no streaming/windowed execution —
SURVEY.md §7.5); added as first-class training-data-pipeline operators.
Both are batch operators over a bounded table — no watermarks:

* ``sessionize``: classic gap-based sessions per user, skew-safe: events
  group by (user_id, day) — a hot user's events spread across day subkeys
  instead of one unbounded group — sessionize locally, then a second
  ``groupby(user_id)`` stitches sessions across day boundaries (gap <=
  threshold merges). The stitch pass moves SESSION SUMMARIES (one small row
  per local session), never events, so the per-user group is bounded by the
  user's session count.
* ``tumbling_window``: pure ``map_batches`` key assignment + groupby
  aggregate — the shuffle moves only (window, partial) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


_DAY_US = 86_400_000_000


def sessionize(ds, gap_seconds: float = 1800.0):
    """Events -> one row per session:
    (user_id, session_seq, n_events, start_us, end_us, duration_us,
    sum_value).

    session_seq numbers a user's sessions in time order (0-based); a new
    session starts when the gap from the previous event exceeds
    ``gap_seconds``. Integer microseconds throughout: timestamps stay exact,
    so session boundaries and durations are bit-stable and
    SQL-oracle-checkable.

    Skew shape: phase 1 groups by (user_id, day) — hot users never form one
    unbounded group — and builds per-day sessions with a vectorized gap scan
    (reduceat, no per-session Python loop). Phase 2 groups the per-day
    SESSION SUMMARIES by user and merges across day boundaries (two local
    sessions merge iff the inter-session gap <= threshold; a >gap_seconds
    empty stretch always separates, so only boundary-adjacent sessions can
    merge). Correctness is split-invariant: a session is a maximal run of
    events with consecutive gaps <= threshold, and the day cut only ever
    splits such runs at points the stitch re-joins.
    """

    gap_us = int(gap_seconds * 1_000_000)
    # coarse shuffle keys: one pandas call handles MANY (user, day) runs
    # vectorized (key-change points are just extra forced session breaks);
    # 256 groups bound per-group Python overhead without undoing skew safety
    # — a hot user's days still scatter across groups
    ngroups = 256

    def add_key(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        uid = batch.column("user_id").to_numpy()
        day = ts // _DAY_US
        key = ((uid * np.int64(0x9E3779B1) + day) % ngroups).astype(np.int64)
        out = batch.append_column("day", pa.array(day, pa.int64()))
        return out.append_column("ckey", pa.array(key, pa.int64()))

    def per_day(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        day = g["day"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = g["value"].to_numpy()
        gaps = np.diff(ts, prepend=ts[0])
        brk = np.r_[
            True,
            (uid[1:] != uid[:-1]) | (day[1:] != day[:-1]) | (gaps[1:] > gap_us),
        ]
        starts = np.nonzero(brk)[0]
        ends = np.r_[starts[1:] - 1, len(ts) - 1]
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "n_events": np.diff(np.r_[starts, len(ts)]).astype(np.int64),
                "start_us": ts[starts],
                "end_us": ts[ends],
                "sum_value": np.add.reduceat(vals, starts),
                "skey": (uid[starts] % ngroups).astype(np.int64),
            }
        )

    day_sessions = (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("ckey")
        .map_groups(per_day, batch_format="pandas")
    )

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        # session summaries for many users: per user the intervals are
        # disjoint, so (user, start) sort is time order; user-change points
        # force breaks
        g = g.sort_values(["user_id", "start_us", "end_us"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        s = g["start_us"].to_numpy()
        e = g["end_us"].to_numpy()
        newu = np.r_[True, uid[1:] != uid[:-1]]
        merge_brk = newu | np.r_[True, (s[1:] - e[:-1]) > gap_us]
        starts = np.nonzero(merge_brk)[0]
        ends = np.r_[starts[1:] - 1, len(s) - 1]
        su = uid[starts]
        # 0-based session_seq within each user
        urun = np.nonzero(np.r_[True, su[1:] != su[:-1]])[0]
        ucnt = np.diff(np.r_[urun, len(su)])
        seq = np.arange(len(su), dtype=np.int64) - np.repeat(urun, ucnt)
        start_us = s[starts]
        end_us = e[ends]
        return pd.DataFrame(
            {
                "user_id": su,
                "session_seq": seq,
                "n_events": np.add.reduceat(
                    g["n_events"].to_numpy(), starts
                ).astype(np.int64),
                "start_us": start_us,
                "end_us": end_us,
                "duration_us": end_us - start_us,
                "sum_value": np.add.reduceat(g["sum_value"].to_numpy(), starts),
            }
        )

    return day_sessions.groupby("skey").map_groups(stitch, batch_format="pandas")


def asof_join(
    left_ds,
    right_ds,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_cols: tuple[str, ...] = ("event_id", "value"),
    suffix: str = "_r",
    bucket_seconds: int = 86_400,
):
    """AS-OF join: for each left row, attach the LATEST right row of the
    same key with right.time <= left.time (NULL columns when none exists).
    Both sides must share a schema (they union before the shuffle).

    Ray Data has no asof operator; this composes one from primitives.
    SKEW-SAFE shape (the sessionize subkey + stitch pattern): rows shuffle
    by hash(key, time-bucket) — a hot key's rows spread across its buckets
    instead of forming one unbounded group. Phase 1 resolves every left
    row whose predecessor lives in its own bucket and emits ONE summary
    row per (key, bucket) holding that bucket's last right row. Phase 2
    shuffles only the UNRESOLVED lefts (per bucket, the prefix before its
    first right) plus the bucket summaries by hash(key) and binary-searches
    the greatest earlier bucket with rights — any right in an earlier
    bucket is <= the left's time by construction, so the bucket summary IS
    the as-of answer. Ties on time pick the right row with the greatest
    (time, *value_cols) sort position (deterministic), same rule in both
    phases.
    """
    ngroups = 256
    bucket_us = int(bucket_seconds) * 1_000_000

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch.column(key_col).to_numpy()
            ts = batch.column(time_col).cast(pa.int64()).to_numpy()
            bkt = ts // bucket_us
            ck = (
                keys.astype(np.int64) * np.int64(0x9E3779B1) + bkt
            ) % ngroups
            out = batch.append_column(
                "_side", pa.array(np.full(len(keys), side, dtype=np.int64))
            )
            out = out.append_column("ts_us_sort", pa.array(ts, pa.int64()))
            out = out.append_column("_bkt", pa.array(bkt, pa.int64()))
            return out.append_column(
                "_ck", pa.array(ck.astype(np.int64), pa.int64())
            )

        return fn

    both = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1), batch_format="pyarrow")
    )
    drop_cols = ["_side", "_ck", "_bkt", "_done", "ts_us_sort"]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = [key_col, "_bkt", "ts_us_sort"] + [
            c for c in value_cols if c in g.columns
        ]
        g = g.sort_values(sort_cols, kind="mergesort")
        out_frames = []
        for _, sub in g.groupby([key_col, "_bkt"], sort=True):
            lm = sub["_side"].to_numpy() == 0
            lsub = sub[lm]
            rsub = sub[~lm]
            if len(rsub):
                # bucket summary: the LAST right row by the tie rule; its
                # suffixed columns carry its own values for phase 2
                summ = rsub.iloc[[-1]].drop(columns=["_side", "_ck"]).copy()
                for vc in value_cols:
                    summ[f"{vc}{suffix}"] = summ[vc].astype(np.float64)
                summ["_done"] = np.int8(2)
                out_frames.append(summ)
            if len(lsub) == 0:
                continue
            lt = lsub["ts_us_sort"].to_numpy()
            rt = rsub["ts_us_sort"].to_numpy()
            pos = np.searchsorted(rt, lt, side="right") - 1
            res = lsub.drop(columns=["_side", "_ck"]).reset_index(drop=True)
            valid = pos >= 0
            for vc in value_cols:
                col = np.full(len(lt), np.nan)
                if valid.any() and len(rsub):
                    col[valid] = rsub[vc].to_numpy()[pos[valid]]
                res[f"{vc}{suffix}"] = col
            res["_done"] = np.where(valid, np.int8(1), np.int8(0)).astype(
                np.int8
            )
            out_frames.append(res)
        if not out_frames:
            cols = [c for c in g.columns if c not in ("_side", "_ck")]
            empty = pd.DataFrame(
                {c: pd.Series([], dtype=g[c].dtype) for c in cols}
            )
            for vc in value_cols:
                empty[f"{vc}{suffix}"] = pd.Series([], dtype=np.float64)
            empty["_done"] = pd.Series([], dtype=np.int8)
            return empty
        return pd.concat(out_frames, ignore_index=True)

    phase1 = (
        both.groupby("_ck")
        .map_groups(merge_bucket, batch_format="pandas")
        .materialize()
    )

    def add_sk(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy()
        sk = (keys.astype(np.int64) * np.int64(0x9E3779B1)) % ngroups
        return batch.append_column("_sk", pa.array(sk.astype(np.int64)))

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        # unresolved lefts (_done=0) + bucket summaries (_done=2) for a set
        # of keys: the as-of answer for a left in bucket b is the summary
        # of the greatest bucket < b that has rights
        out_frames = []
        for _, sub in g.groupby(key_col, sort=True):
            summ = sub[sub["_done"].to_numpy() == 2].sort_values("_bkt")
            lsub = sub[sub["_done"].to_numpy() == 0]
            if len(lsub) == 0:
                continue
            res = lsub.drop(columns=["_sk"]).reset_index(drop=True)
            sb = summ["_bkt"].to_numpy()
            pos = np.searchsorted(sb, lsub["_bkt"].to_numpy(), side="left") - 1
            valid = pos >= 0
            for vc in value_cols:
                col = np.full(len(res), np.nan)
                if valid.any() and len(summ):
                    col[valid] = (
                        summ[f"{vc}{suffix}"].to_numpy()[pos[valid]]
                    )
                res[f"{vc}{suffix}"] = col
            out_frames.append(res)
        if not out_frames:
            cols = [c for c in g.columns if c != "_sk"]
            return pd.DataFrame(
                {c: pd.Series([], dtype=g[c].dtype) for c in cols}
            )
        return pd.concat(out_frames, ignore_index=True)

    def finish(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(
            [c for c in drop_cols if c in batch.column_names]
        )

    done = phase1.filter(expr="_done == 1").map_batches(
        finish, batch_format="pyarrow"
    )
    stitched = (
        phase1.filter(expr="_done != 1")
        .map_batches(add_sk, batch_format="pyarrow")
        .groupby("_sk")
        .map_groups(stitch, batch_format="pandas")
        .map_batches(finish, batch_format="pyarrow")
    )
    return done.union(stitched)


def interval_join(
    ds,
    intervals_ref,
    key_col: str = "user_id",
    time_col: str = "ts",
    start_col: str = "start_us",
    end_col: str = "end_us",
    attach_cols: tuple[str, ...] = ("session_seq",),
):
    """Range join: each row joins the interval (of its key) containing its
    timestamp — inner, rows with no containing interval drop.

    Scale shape: the interval table is the SMALL side (e.g. sessions:
    orders of magnitude fewer rows than events), broadcast once via
    ``ray.put`` as per-key sorted arrays; each map task binary-searches its
    batch vectorized (searchsorted over the key's interval starts, then a
    containment check). No shuffle at all — the big side streams.

    ``intervals_ref``: ray.ObjectRef to a pandas DataFrame with
    (key, start, end, *attach_cols); intervals per key must be disjoint
    (sessions are, by construction)."""
    from ..util import cached_stage

    stage = cached_stage(
        _IntervalJoin, intervals_ref, key_col, time_col, start_col, end_col,
        attach_cols,
    )
    return ds.map_batches(stage, batch_format="pyarrow")


class _IntervalJoin:
    """Per-worker state: the broadcast interval table parsed once into
    per-key sorted arrays."""

    def __init__(self, intervals_ref, key_col, time_col, start_col, end_col,
                 attach_cols):
        import ray as _ray

        idf = _ray.get(intervals_ref) if not hasattr(intervals_ref, "groupby") \
            else intervals_ref
        self.key_col = key_col
        self.time_col = time_col
        self.attach_cols = tuple(attach_cols)
        self.per_key: dict[int, tuple] = {}
        for k, sub in idf.groupby(key_col):
            sub = sub.sort_values(start_col)
            self.per_key[int(k)] = (
                sub[start_col].to_numpy(),
                sub[end_col].to_numpy(),
                {c: sub[c].to_numpy() for c in self.attach_cols},
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        key_col, time_col = self.key_col, self.time_col
        attach_cols = self.attach_cols
        per_key = self.per_key
        keys = batch.column(key_col).to_numpy()
        ts = batch.column(time_col).cast(pa.int64()).to_numpy()
        take: list[int] = []
        attached: dict[str, list] = {c: [] for c in attach_cols}
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        bounds = np.nonzero(np.r_[True, sk[1:] != sk[:-1]])[0]
        ends_ = np.r_[bounds[1:], len(sk)]
        for b0, b1 in zip(bounds.tolist(), ends_.tolist()):
            k = int(sk[b0])
            ent = per_key.get(k)
            if ent is None:
                continue
            starts, iends, cols = ent
            rows = order[b0:b1]
            t = ts[rows]
            pos = np.searchsorted(starts, t, side="right") - 1
            ok = (pos >= 0) & (t <= iends[np.maximum(pos, 0)])
            hit = rows[ok]
            hp = pos[ok]
            take.extend(hit.tolist())
            for c in attach_cols:
                attached[c].extend(cols[c][hp].tolist())
        if not take:
            empty = batch.slice(0, 0)
            for c in attach_cols:
                empty = empty.append_column(c, pa.array([], pa.int64()))
            return empty
        out = batch.take(pa.array(np.array(take, dtype=np.int64)))
        for c in attach_cols:
            out = out.append_column(
                c, pa.array(np.array(attached[c]))
            )
        return out


def sliding_window(ds, window_seconds: int = 3600, hop_seconds: int = 900):
    """Sliding/hopping-window aggregate: windows of ``window_seconds`` start
    every ``hop_seconds``; an event belongs to every window covering its
    timestamp (window/hop of them). Same scale shape as tumbling_window:
    vectorized flat-map assignment + per-batch partial aggregation, so the
    shuffle moves (window, type, partial) rows — each event contributes to
    window/hop partials but partials collapse per batch before moving."""
    if window_seconds % hop_seconds != 0:
        raise ValueError("window_seconds must be a multiple of hop_seconds")
    k = window_seconds // hop_seconds

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy() // 1_000_000
        base = (ts // hop_seconds) * hop_seconds
        n = len(ts)
        starts = (
            base[:, None] - np.arange(k, dtype=np.int64)[None, :] * hop_seconds
        ).ravel()
        ev = np.repeat(batch.column("event_type").to_numpy(zero_copy_only=False), k)
        val = np.repeat(batch.column("value").to_numpy(), k)
        df = pd.DataFrame(
            {"window_start": starts, "event_type": ev, "value": val}
        )
        agg = df.groupby(["window_start", "event_type"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = ds.map_batches(assign, batch_format="pyarrow")
    # builtin sum aggregate: no per-group Python call for the (many) windows
    out = partials.groupby(["window_start", "event_type"]).sum(
        ["n_events", "sum_value"]
    )
    return out.map_batches(
        lambda b: b.rename_columns(
            ["window_start", "event_type", "n_events", "sum_value"]
        ),
        batch_format="pyarrow",
    )


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
    out = partials.groupby(["window_start", "event_type"]).sum(
        ["n_events", "sum_value"]
    )
    return out.map_batches(
        lambda b: b.rename_columns(
            ["window_start", "event_type", "n_events", "sum_value"]
        ),
        batch_format="pyarrow",
    )
