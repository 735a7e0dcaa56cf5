"""Data profiling / validation — the Deequ/Great-Expectations-style pass a
training-data pipeline runs before trusting a new corpus drop.

``profile_columns`` computes per-column (n, n_null, n_distinct, min, max)
for int64 and string columns in ONE streaming pass: every batch emits
tagged partial rows —

* metric rows: (col, n, n_null, min_s, max_s) — one per column per batch;
* distinct rows: (col, value) pairs, per-batch deduped —

and one groupby per stream finalizes. The distinct count is EXACT; its
exchange is bounded by the per-block distinct-value count (the same
partial-combine bound as exact_dedup), never the row count. Values
canonicalize to strings with formats DuckDB reproduces exactly
(CAST(BIGINT AS VARCHAR) == str(int); strings verbatim), so the whole
profile is SQL-oracle-checkable bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def profile_columns(ds, columns: list[str]):
    """Dataset of (column, n, n_null, n_distinct, min_s, max_s), one row
    per profiled column. Supported column types: integer and string (the
    SQL-canonical ones); min/max compare in the native type and are then
    canonicalized to strings."""

    def partial(b: pa.Table) -> pa.Table:
        mrows = {"col": [], "vkind": [], "n": [], "n_null": [],
                 "min_s": [], "max_s": []}
        dcol, dval = [], []
        for c in columns:
            arr = b.column(c)
            n = len(arr)
            n_null = arr.null_count
            valid = arr.drop_null()
            if pa.types.is_integer(arr.type):
                vkind = 0
                vals = valid.to_numpy(zero_copy_only=False)
                if len(vals):
                    mn, mx = str(int(vals.min())), str(int(vals.max()))
                else:
                    mn = mx = None
                uniq = [str(int(v)) for v in np.unique(vals)]
            elif pa.types.is_string(arr.type) or pa.types.is_large_string(
                arr.type
            ):
                vkind = 1
                u = pc.unique(valid)
                uniq = u.to_pylist()
                mn = min(uniq) if uniq else None
                mx = max(uniq) if uniq else None
            else:
                raise TypeError(
                    f"profile_columns: unsupported type {arr.type} for {c!r}"
                )
            mrows["col"].append(c)
            # carry the COLUMN TYPE to the finalizer explicitly (0=int,
            # 1=string): sniffing "is the min string all digits?" at
            # finalize breaks string columns with numeric-looking values
            # (zip codes, version strings: lexicographic min('10','9') is
            # '10', integer re-parse would return '9')
            mrows["vkind"].append(vkind)
            mrows["n"].append(n)
            mrows["n_null"].append(n_null)
            mrows["min_s"].append(mn)
            mrows["max_s"].append(mx)
            dcol.extend([c] * len(uniq))
            dval.extend(uniq)
        metric = pa.table(
            {
                "col": pa.array(mrows["col"], pa.string()),
                "vkind": pa.array(mrows["vkind"], pa.int8()),
                "n": pa.array(mrows["n"], pa.int64()),
                "n_null": pa.array(mrows["n_null"], pa.int64()),
                "min_s": pa.array(mrows["min_s"], pa.string()),
                "max_s": pa.array(mrows["max_s"], pa.string()),
            }
        )
        distinct = pa.table(
            {
                "col": pa.array(dcol, pa.string()),
                "val": pa.array(dval, pa.string()),
            }
        )
        return metric, distinct

    # one pass, two output streams: run the batch fn once per batch and
    # interleave the two row kinds in a single tagged table
    def tagged(b: pa.Table) -> pa.Table:
        metric, distinct = partial(b)
        m = pa.table(
            {
                "col": metric.column("col"),
                "val": pa.array([None] * metric.num_rows, pa.string()),
                "vkind": metric.column("vkind"),
                "n": metric.column("n"),
                "n_null": metric.column("n_null"),
                "min_s": metric.column("min_s"),
                "max_s": metric.column("max_s"),
                "kind": pa.array(
                    np.zeros(metric.num_rows, np.int8), pa.int8()
                ),
            }
        )
        z = pa.array(np.zeros(distinct.num_rows, np.int64), pa.int64())
        nul = pa.array([None] * distinct.num_rows, pa.string())
        d = pa.table(
            {
                "col": distinct.column("col"),
                "val": distinct.column("val"),
                "vkind": pa.array(
                    np.zeros(distinct.num_rows, np.int8), pa.int8()
                ),
                "n": z,
                "n_null": z,
                "min_s": nul,
                "max_s": nul,
                "kind": pa.array(
                    np.ones(distinct.num_rows, np.int8), pa.int8()
                ),
            }
        )
        return pa.concat_tables([m, d])

    rows = ds.map_batches(tagged, batch_format="pyarrow")

    # distinct count WITHOUT a per-column hot group: global (col, val)
    # dedupe (exchange = distinct pairs), then per-batch count partials —
    # a key column's distinct set never lands in one task
    import pyarrow as pa_

    dedup = (
        rows.filter(expr="kind == 1")
        .groupby(["col", "val"])
        .count()
    )

    def dcount_part(b: pa_.Table) -> pa_.Table:
        cols = b.column("col").to_pylist()
        uniq, inv = np.unique(np.asarray(cols, object), return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        return pa_.table(
            {
                "col": pa_.array(list(uniq), pa_.string()),
                "n_distinct": pa_.array(cnt, pa_.int64()),
            }
        )

    dcounts = (
        dedup.map_batches(dcount_part, batch_format="pyarrow")
        .groupby("col")
        .sum("n_distinct")
        .map_batches(
            lambda b: b.rename_columns(["col", "n_distinct"]),
            batch_format="pyarrow",
        )
    )

    def metric_final(g: pd.DataFrame) -> pd.DataFrame:
        m = g[g["kind"] == 0]
        mn = m["min_s"].dropna()
        mx = m["max_s"].dropna()
        col = str(g["col"].iloc[0])
        int_col = len(m) > 0 and int(m["vkind"].iloc[0]) == 0
        if int_col:
            mins = str(min(int(x) for x in mn)) if len(mn) else None
            maxs = str(max(int(x) for x in mx)) if len(mx) else None
        else:
            mins = mn.min() if len(mn) else None
            maxs = mx.max() if len(mx) else None
        return pd.DataFrame(
            {
                "col": [col],
                "n": [int(m["n"].sum())],
                "n_null": [int(m["n_null"].sum())],
                "min_s": [mins],
                "max_s": [maxs],
            }
        )

    metrics = (
        rows.filter(expr="kind == 0")
        .groupby("col")
        .map_groups(metric_final, batch_format="pandas")
    )
    # both sides are #columns rows — the driver-side merge is trivial
    mdf = metrics.to_pandas()
    ddf = dcounts.to_pandas()
    out = mdf.merge(ddf, on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype(np.int64)
    out = out[["col", "n", "n_null", "n_distinct", "min_s", "max_s"]]
    import ray.data

    return ray.data.from_pandas(
        out.sort_values("col").reset_index(drop=True)
    )


def check_constraints(ds, constraints: list[dict]):
    """Data-quality validation (the Deequ ``check`` side): evaluate a list
    of declarative constraints in one streaming pass and return one row
    per constraint: (constraint, column, n_checked, n_violations).

    Constraint kinds:
      {"kind": "not_null", "col": c}          — null rows violate
      {"kind": "range", "col": c, "lo": x, "hi": y}  — outside [lo, hi]
      {"kind": "in_set", "col": c, "values": [...]}  — not in the set
      {"kind": "unique", "col": c}            — violations = n - n_distinct

    not_null/range/in_set are pure per-batch counts (one tiny partial row
    per constraint per block, no data movement); unique reuses the
    profile's distinct machinery (per-block-deduped value exchange).
    """
    simple = [c for c in constraints if c["kind"] != "unique"]
    uniq = [c for c in constraints if c["kind"] == "unique"]

    def partial(b: pa.Table) -> pa.Table:
        names, cols, checked, viol = [], [], [], []
        for c in simple:
            col = c["col"]
            arr = b.column(col)
            n = len(arr)
            if c["kind"] == "not_null":
                v = arr.null_count
            elif c["kind"] == "range":
                ok = pc.and_(
                    pc.greater_equal(arr, pa.scalar(c["lo"])),
                    pc.less_equal(arr, pa.scalar(c["hi"])),
                )
                v = n - pc.sum(pc.cast(pc.fill_null(ok, False), pa.int64())).as_py()
            elif c["kind"] == "in_set":
                ok = pc.is_in(arr, value_set=pa.array(c["values"]))
                v = n - pc.sum(pc.cast(pc.fill_null(ok, False), pa.int64())).as_py()
            else:
                raise ValueError(f"unknown constraint kind {c['kind']!r}")
            names.append(c["kind"])
            cols.append(col)
            checked.append(n)
            viol.append(int(v))
        return pa.table(
            {
                "constraint": pa.array(names, pa.string()),
                "col": pa.array(cols, pa.string()),
                "n_checked": pa.array(checked, pa.int64()),
                "n_violations": pa.array(viol, pa.int64()),
            }
        )

    parts = []
    if simple:
        out = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["constraint", "col"])
            .sum(["n_checked", "n_violations"])
            .map_batches(
                lambda b: b.rename_columns(
                    ["constraint", "col", "n_checked", "n_violations"]
                ),
                batch_format="pyarrow",
            )
        )
        parts.append(out.to_pandas())
    for c in uniq:
        prof = profile_columns(ds, [c["col"]]).to_pandas()
        n = int(prof["n"].iloc[0])
        nd = int(prof["n_distinct"].iloc[0])
        nn = int(prof["n_null"].iloc[0])
        parts.append(
            pd.DataFrame(
                {
                    "constraint": ["unique"],
                    "col": [c["col"]],
                    "n_checked": [n],
                    "n_violations": [(n - nn) - nd],
                }
            )
        )
    import ray.data

    res = pd.concat(parts, ignore_index=True)
    return ray.data.from_pandas(
        res.sort_values(["constraint", "col"]).reset_index(drop=True)
    )


def benford_digits(ds, value_col: str):
    """Benford's-law first-digit profile — the classic synthetic-data /
    fraud screen: counts of leading digits 1-9 of a positive integer
    column, plus each digit's expected Benford share. Counts are one
    tiny partial-sum exchange; expectation log10(1+1/d) is a per-row
    float both sides compute identically."""
    import pyarrow as pa

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        v = v[v > 0]
        # leading digit via the decimal string (exact; no float log)
        digs = np.array(
            [int(str(int(x))[0]) for x in v], np.int64
        ) if len(v) else np.array([], np.int64)
        d, c = np.unique(digs, return_counts=True)
        return pa.table(
            {
                "digit": pa.array(d, pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    f = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("digit")
        .sum("cnt")
        .to_pandas()
    )
    f.columns = ["digit", "cnt"]
    full = pd.DataFrame({"digit": np.arange(1, 10, dtype=np.int64)})
    out = full.merge(f, on="digit", how="left").fillna({"cnt": 0})
    out["cnt"] = out["cnt"].astype(np.int64)
    # parts-per-million integer: LOG10 differs from numpy's log10 in the
    # last ulp on some inputs (measured: digit 6), so the oracle-compared
    # column is the ppm rounding, whose margins (>= 0.005) dwarf ulp noise
    out["expected_ppm"] = np.round(
        np.log10(1.0 + 1.0 / out["digit"].to_numpy()) * 1e6
    ).astype(np.int64)
    return out.sort_values("digit").reset_index(drop=True)


def psi_buckets(ds, value_col: str, group_col: str, group_a, group_b,
                edges: list):
    """Population Stability Index buckets — the standard drift monitor
    between a baseline and a current sample: per fixed bucket, exact
    integer counts for both groups and the mirrored per-bucket PSI term
    (pa - pb) * ln(pa / pb) (one float expression per row; the scalar
    PSI is the consumer's sum). ``edges`` are the interior bucket
    boundaries (k edges -> k+1 buckets, right-open)."""
    import pyarrow as pa

    e = np.asarray(edges, np.int64)

    def partial(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        rows_b, rows_a, rows_c = [], [], []
        for want, which in ((group_a, "a"), (group_b, "b")):
            vv = v[g == want]
            idx = np.searchsorted(e, vv, side="right")
            bk, c = np.unique(idx, return_counts=True)
            rows_b.append(bk)
            rows_a.append(c if which == "a" else np.zeros(len(bk), np.int64))
            rows_c.append(c if which == "b" else np.zeros(len(bk), np.int64))
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(rows_b), pa.int64()),
                "ca": pa.array(
                    np.concatenate(rows_a).astype(np.int64), pa.int64()
                ),
                "cb": pa.array(
                    np.concatenate(rows_c).astype(np.int64), pa.int64()
                ),
            }
        )

    f = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum(["ca", "cb"])
        .to_pandas()
    )
    f.columns = ["bucket", "ca", "cb"]
    full = pd.DataFrame({"bucket": np.arange(len(e) + 1, dtype=np.int64)})
    out = full.merge(f, on="bucket", how="left").fillna({"ca": 0, "cb": 0})
    out["ca"] = out["ca"].astype(np.int64)
    out["cb"] = out["cb"].astype(np.int64)
    na, nb = int(out["ca"].sum()), int(out["cb"].sum())
    pa_ = out["ca"].to_numpy() / float(na)
    pb_ = out["cb"].to_numpy() / float(nb)
    with np.errstate(divide="ignore", invalid="ignore"):
        term = (pa_ - pb_) * np.log(pa_ / pb_)
    out["psi_term"] = np.where(
        (out["ca"] > 0) & (out["cb"] > 0), term, np.nan
    )
    return out.sort_values("bucket").reset_index(drop=True)
