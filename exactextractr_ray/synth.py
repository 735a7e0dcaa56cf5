"""Deterministic synthetic inputs shared by the Ray pipelines, the DuckDB
oracles, and the benchmarks.

Everything here is a pure function of integer indices so that the Ray side
(numpy) and the oracle side (SQL over DuckDB) compute bit-identical values:

* raster values are small integers; NODATA cells are fixed by a modular rule;
* zone rectangles are aligned to quarter-cell boundaries so every coverage
  fraction is an exact binary fraction (multiples of 1/16) and all
  coverage-weighted sums are exact in float64 — aggregation order cannot
  change the result;
* geocoding is a Knuth multiplicative hash of doc_id, exactly expressible in
  SQL integer arithmetic.

This mirrors the reference's seeded-fixture test strategy
(/root/reference/tests/testthat/helper_functions.R:16-59) while adding the
determinism-at-any-parallelism requirement of the rebuild (BASELINE.json).
"""

from __future__ import annotations

import numpy as np

from .grid import Grid

# ---------------- synthetic raster ----------------

VAL_A, VAL_B, VAL_MOD = 7919, 104729, 1000  # value = (r*A + c*B) % MOD
NA_A, NA_B, NA_MOD = 31, 17, 23  # NODATA where (r*A + c*B) % MOD == 0
W_A, W_B, W_MOD = 13, 29, 7  # weight layer = (r*A + c*B) % MOD + 1

#: NODATA sentinel for integer-stored tiles (int16/int32): the most negative
#: int16. Float-stored tiles use NaN. Consumers translate sentinel -> NaN at
#: the compute edge (stats.py INT_NODATA is the same constant).
INT_NODATA = -32768


def synth_values(
    rows: np.ndarray, cols: np.ndarray, dtype=np.float64
) -> np.ndarray:
    """Integer-valued raster with deterministic NODATA holes. rows/cols are
    GLOBAL (grid-level) indices; row 0 at the top. Identical math to
    synth_value_sql (mod distributes over the sum)."""
    r = np.asarray(rows, dtype=np.int64)
    c = np.asarray(cols, dtype=np.int64)
    if r.ndim == 2 and r.shape == c.shape:
        # separable: 1-D modular partials, then ONE int32 2-D add with a
        # conditional subtract instead of a full-array integer division —
        # bit-identical values, ~3x less generation bandwidth (generation
        # showed up as the hottest pass in the zonal profile)
        # 2-D intermediates in int16 when the target is a small int (sum
        # < 2*VAL_MOD = 2000 and < 2*NA_MOD: both fit) — generation is
        # bandwidth-bound, so intermediate width is the cost
        small = np.dtype(dtype).kind in "iu" and np.dtype(dtype).itemsize <= 2
        idt = np.int16 if small else np.int32
        rv = ((r[:, 0] * VAL_A) % VAL_MOD).astype(idt)
        cv = ((c[0, :] * VAL_B) % VAL_MOD).astype(idt)
        t = rv[:, None] + cv[None, :]  # each < VAL_MOD -> sum < 2*VAL_MOD
        t = np.where(t >= VAL_MOD, t - idt(VAL_MOD), t)
        rn = ((r[:, 0] * NA_A) % NA_MOD).astype(idt)
        cn = ((c[0, :] * NA_B) % NA_MOD).astype(idt)
        tn = rn[:, None] + cn[None, :]
        v = t.astype(dtype, copy=False)
        # NODATA: NaN for float storage, INT_NODATA sentinel for integer
        # storage (int16 tiles are the DRAM-bandwidth path: 2 bytes/cell)
        hole = (tn == 0) | (tn == NA_MOD)
        v[hole] = INT_NODATA if np.dtype(dtype).kind in "iu" else np.nan
        return v
    v = ((r * VAL_A + c * VAL_B) % VAL_MOD).astype(np.dtype(dtype))
    hole = (r * NA_A + c * NA_B) % NA_MOD == 0
    v[hole] = INT_NODATA if np.dtype(dtype).kind in "iu" else np.nan
    return v


def synth_weights(
    rows: np.ndarray, cols: np.ndarray, dtype=np.float64
) -> np.ndarray:
    r = np.asarray(rows, dtype=np.int64)
    c = np.asarray(cols, dtype=np.int64)
    if r.ndim == 2 and r.shape == c.shape:
        small = np.dtype(dtype).kind in "iu" and np.dtype(dtype).itemsize <= 2
        idt = np.int16 if small else np.int32
        rw = ((r[:, 0] * W_A) % W_MOD).astype(idt)
        cw = ((c[0, :] * W_B) % W_MOD).astype(idt)
        t = rw[:, None] + cw[None, :]
        t = np.where(t >= W_MOD, t - idt(W_MOD), t)
        return (t + idt(1)).astype(dtype, copy=False)
    return ((r * W_A + c * W_B) % W_MOD + 1).astype(np.float64)


def synth_value_sql(r: str = "r", c: str = "c") -> str:
    """SQL expression computing synth_values for integer columns r, c."""
    return (
        f"CASE WHEN ({r}*{NA_A} + {c}*{NA_B}) % {NA_MOD} = 0 THEN NULL "
        f"ELSE CAST(({r}*{VAL_A} + {c}*{VAL_B}) % {VAL_MOD} AS DOUBLE) END"
    )


def synth_weight_sql(r: str = "r", c: str = "c") -> str:
    return f"CAST(({r}*{W_A} + {c}*{W_B}) % {W_MOD} + 1 AS DOUBLE)"


def synth_grid(n: int = 64) -> Grid:
    """n x n grid over [0, n]^2 with unit cells (row 0 at top, y = n)."""
    return Grid(0.0, 0.0, float(n), float(n), 1.0, 1.0)


# ---------------- synthetic zones (quarter-cell-aligned rectangles) --------


def synth_rect_zone_bounds(k: int, n: int = 64) -> tuple[float, float, float, float]:
    """Rectangle for zone k, aligned to quarter cells; pure integer math.

    Matches synth_rect_zone_sql exactly. One zone in four extends past the
    grid edge (clipping path); zone widths vary to exercise multi-tile spans.
    """
    x0q = (k * 29) % (3 * n)  # in quarter-cells over [0, 3n/4) world
    y0q = (k * 53) % (3 * n)
    wq = 2 * n + ((k * 17) % (2 * n))  # width n/2 .. n quarter-cells
    hq = 2 * n + ((k * 37) % (2 * n))
    return (x0q / 4.0, y0q / 4.0, (x0q + wq) / 4.0, (y0q + hq) / 4.0)


def synth_rect_zones_sql(num_zones: int, n: int = 64) -> str:
    """SQL relation (zone_id, xmin, ymin, xmax, ymax) matching
    synth_rect_zone_bounds."""
    return f"""
    SELECT CAST(k AS BIGINT) AS zone_id,
           ((k*29) % {3*n}) / 4.0 AS xmin,
           ((k*53) % {3*n}) / 4.0 AS ymin,
           (((k*29) % {3*n}) + {2*n} + ((k*17) % {2*n})) / 4.0 AS xmax,
           (((k*53) % {3*n}) + {2*n} + ((k*37) % {2*n})) / 4.0 AS ymax
    FROM range(0, {num_zones}) t(k)
    """


def cells_sql(n: int = 64) -> str:
    """SQL relation (r, c, x0, x1, y0, y1, val, wgt) of all grid cells.
    Row 0 at the top: y in [n-r-1, n-r]."""
    return f"""
    SELECT (i // {n}) AS r, (i % {n}) AS c,
           CAST(i % {n} AS DOUBLE) AS x0, CAST(i % {n} + 1 AS DOUBLE) AS x1,
           CAST({n} - (i // {n}) - 1 AS DOUBLE) AS y0,
           CAST({n} - (i // {n}) AS DOUBLE) AS y1,
           {synth_value_sql('(i // %d)' % n, '(i %% %d)' % n)} AS val,
           {synth_weight_sql('(i // %d)' % n, '(i %% %d)' % n)} AS wgt
    FROM range(0, {n * n}) t(i)
    """


def rect_cov_sql(n: int = 64, num_zones: int = 12) -> str:
    """SQL relation (zone_id, r, c, val, wgt, cov) of exact per-cell coverage
    of the synthetic rectangle zones — closed-form rectangle/cell overlap."""
    return f"""
    SELECT z.zone_id, v.r, v.c, v.val, v.wgt,
           GREATEST(0.0, LEAST(v.x1, z.xmax) - GREATEST(v.x0, z.xmin)) *
           GREATEST(0.0, LEAST(v.y1, z.ymax) - GREATEST(v.y0, z.ymin)) AS cov
    FROM ({synth_rect_zones_sql(num_zones, n)}) z
    CROSS JOIN ({cells_sql(n)}) v
    WHERE v.x1 > z.xmin AND v.x0 < z.xmax AND v.y1 > z.ymin AND v.y0 < z.ymax
    """


# ---------------- synthetic line zones (horizontal, eighth-aligned) -------


def synth_line_zone(k: int, n: int = 64) -> tuple[float, float, float]:
    """Horizontal line k: (y, x0, x1). y is eighth-aligned and never an
    integer (no cell-boundary ambiguity); x endpoints quarter-aligned so
    per-cell lengths are exact binary fractions. Matches synth_line_sql."""
    y = ((k * 13) % (4 * (n - 1))) / 4.0 + 0.125
    x0 = ((k * 29) % (2 * n)) / 4.0
    x1 = x0 + n / 4.0 + ((k * 7) % n) / 4.0
    return (y, x0, min(x1, float(n)))


def synth_line_zones_sql(num: int, n: int = 64) -> str:
    return f"""
    SELECT CAST(k AS BIGINT) AS zone_id,
           ((k*13) % {4*(n-1)}) / 4.0 + 0.125 AS y,
           ((k*29) % {2*n}) / 4.0 AS x0,
           LEAST(((k*29) % {2*n}) / 4.0 + {n}/4.0 + ((k*7) % {n}) / 4.0,
                 CAST({n} AS DOUBLE)) AS x1
    FROM range(0, {num}) t(k)
    """


def line_cov_sql(n: int = 64, num: int = 8) -> str:
    """(zone_id, r, c, val, cov) with cov = per-cell traversal length of the
    horizontal line — closed-form x-interval overlap in the cell row
    containing y (rows count from the top: r = n-1-floor(y))."""
    return f"""
    SELECT z.zone_id, v.r, v.c, v.val,
           GREATEST(0.0, LEAST(v.x1, z.x1) - GREATEST(v.x0, z.x0)) AS cov
    FROM ({synth_line_zones_sql(num, n)}) z
    JOIN ({cells_sql(n)}) v
      ON v.r = {n - 1} - CAST(FLOOR(z.y) AS BIGINT)
     AND v.x1 > z.x0 AND v.x0 < z.x1
    """


# ---------------- deterministic geocoding ----------------

LON_MULT = 2654435761  # Knuth multiplicative hash constants
LAT_MULT = 2246822519
HASH_MOD = 4294967296  # 2^32


def geocode_ids(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """doc_id -> (lon, lat); pure integer hash, exact in SQL too.
    lat restricted to [-60, 60) per FIXTURES.md."""
    i = np.asarray(ids, dtype=np.int64)
    lon = ((i * LON_MULT) % HASH_MOD).astype(np.float64) / HASH_MOD * 360.0 - 180.0
    lat = ((i * LAT_MULT) % HASH_MOD).astype(np.float64) / HASH_MOD * 120.0 - 60.0
    return lon, lat


GEOCODE_LON_SQL = (
    f"((doc_id * {LON_MULT}) % {HASH_MOD}) / {float(HASH_MOD)} * 360.0 - 180.0"
)
GEOCODE_LAT_SQL = (
    f"((doc_id * {LAT_MULT}) % {HASH_MOD}) / {float(HASH_MOD)} * 120.0 - 60.0"
)


def cell_for_lonlat(lon: np.ndarray, lat: np.ndarray, res_deg: float = 3.0) -> np.ndarray:
    """Flat lat/lon grid cell id (H3-style spatial key fallback; no h3 lib in
    this env — see FIXTURES.md §1). ncols = 360/res."""
    ncols = int(round(360.0 / res_deg))
    cx = np.floor((np.asarray(lon) + 180.0) / res_deg).astype(np.int64)
    cy = np.floor((np.asarray(lat) + 90.0) / res_deg).astype(np.int64)
    return cy * ncols + cx


def cell_sql(res_deg: float = 3.0) -> str:
    ncols = int(round(360.0 / res_deg))
    return (
        f"CAST(FLOOR((lat + 90.0) / {res_deg}) AS BIGINT) * {ncols} "
        f"+ CAST(FLOOR((lon + 180.0) / {res_deg}) AS BIGINT)"
    )


# ---------------- hierarchical / hexagonal spatial keys ------------------


def hilbert_cell_sql(level: int = 8, from_rel: str = "geo") -> str:
    """SQL computing the Hilbert-curve index (S2-style locality key) for
    (doc_id, lon, lat) rows in ``from_rel`` — the xy2d loop unrolled as one
    chained CTE per level, bit-identical to stages.spatial.hilbert_cell.
    Returns a relation (doc_id, hilbert_cell)."""
    n = 1 << level
    parts = [
        f"""h0 AS (
      SELECT doc_id,
        LEAST(GREATEST(CAST(FLOOR((lon + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1}) AS x,
        LEAST(GREATEST(CAST(FLOOR((lat + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1}) AS y,
        CAST(0 AS BIGINT) AS d
      FROM {from_rel})"""
    ]
    s = n >> 1
    i = 0
    while s > 0:
        i += 1
        parts.append(
            f"""h{i} AS (
      SELECT doc_id,
        CASE WHEN (y // {s}) % 2 = 1 THEN x
             WHEN (x // {s}) % 2 = 1 THEN {n - 1} - y
             ELSE y END AS x,
        CASE WHEN (y // {s}) % 2 = 1 THEN y
             WHEN (x // {s}) % 2 = 1 THEN {n - 1} - x
             ELSE x END AS y,
        d + {s * s} * (CASE WHEN (x // {s}) % 2 = 1 AND (y // {s}) % 2 = 0 THEN 3
                            WHEN (x // {s}) % 2 = 1 THEN 2
                            WHEN (y // {s}) % 2 = 1 THEN 1
                            ELSE 0 END) AS d
      FROM h{i - 1})"""
        )
        s >>= 1
    ctes = ",\n    ".join(parts)
    return f"{ctes}\n    SELECT doc_id, d AS hilbert_cell FROM h{i}"


def hex_cell_sql(size: float = 4.0, from_rel: str = "geo") -> str:
    """SQL computing the pointy-top hexagon id (H3-style bin) for
    (doc_id, lon, lat) rows in ``from_rel`` via the 9-candidate
    nearest-center rule, bit-identical to stages.spatial.hex_cell.
    Float constants are embedded with repr() (shortest round-trip decimal),
    so DuckDB parses the exact same doubles numpy computes."""
    w = repr(float(np.sqrt(3.0) * size))
    halfw = repr(float(np.sqrt(3.0) * size * 0.5))
    ystep = repr(float(1.5 * size))
    return f"""xy AS (
      SELECT doc_id, lon + 180.0 AS x, lat + 90.0 AS y FROM {from_rel}),
    base AS (
      SELECT doc_id, x, y,
        CAST(FLOOR(y / {ystep}) AS BIGINT) AS r0,
        CAST(FLOOR(x / {w}) AS BIGINT) AS c0
      FROM xy),
    cand AS (
      SELECT doc_id, x, y, r0 + dr.d AS r, c0 + dc.d AS c
      FROM base, (VALUES (-1), (0), (1)) dr(d), (VALUES (-1), (0), (1)) dc(d)),
    ctr AS (
      SELECT doc_id, x, y, r, c,
        c * {w} + ((r % 2 + 2) % 2) * {halfw} AS cx,
        r * {ystep} AS cy
      FROM cand),
    scored AS (
      SELECT doc_id, r, c,
        (x - cx) * (x - cx) + (y - cy) * (y - cy) AS d2
      FROM ctr),
    pick AS (
      SELECT doc_id, r, c,
        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d2, r, c) AS rn
      FROM scored)
    SELECT doc_id, r * 1048576 + c AS hex_cell FROM pick WHERE rn = 1"""


# ---------------- geo zones in lon/lat space (for the PIP join) ----------


def synth_geo_zone_bounds(k: int) -> tuple[float, float, float, float]:
    """Rectangular lon/lat zone k; pure integer math over tenths of degrees.
    Matches synth_geo_zones_sql exactly."""
    x0 = ((k * 173) % 3000) / 10.0 - 180.0  # [-180, 120)
    y0 = ((k * 97) % 900) / 10.0 - 55.0  # [-55, 35)
    w = (200 + (k * 31) % 400) / 10.0  # 20..60 deg
    h = (100 + (k * 61) % 200) / 10.0  # 10..30 deg
    return (x0, y0, x0 + w, y0 + h)


def synth_geo_zones_sql(num_zones: int) -> str:
    return f"""
    SELECT CAST(k AS BIGINT) AS zone_id,
           ((k*173) % 3000) / 10.0 - 180.0 AS xmin,
           ((k*97) % 900) / 10.0 - 55.0 AS ymin,
           ((k*173) % 3000) / 10.0 - 180.0 + (200 + (k*31) % 400) / 10.0 AS xmax,
           ((k*97) % 900) / 10.0 - 55.0 + (100 + (k*61) % 200) / 10.0 AS ymax
    FROM range(0, {num_zones}) t(k)
    """


_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_sql(nchars: int = 8) -> str:
    """SQL expression (over columns mx, my: the 20-bit lon/lat integers)
    for the classic base32 geohash — bit-for-bit the interleave in
    stages/spatial.py:geohash_batch. Stream bit j (MSB-first, lon first)
    is lon bit 19-j//2 for even j, lat bit 19-(j-1)//2 for odd j; each
    output char encodes five stream bits."""
    chars = []
    for k in range(nchars):
        terms = []
        for b in range(5):
            j = 5 * k + b
            if j % 2 == 0:
                bit = f"((mx >> {19 - j // 2}) & 1)"
            else:
                bit = f"((my >> {19 - (j - 1) // 2}) & 1)"
            terms.append(f"{bit} * {1 << (4 - b)}")
        v = " + ".join(terms)
        chars.append(f"substr('{_B32}', CAST({v} AS INT) + 1, 1)")
    return " || ".join(chars)


GEOHASH_MX_SQL = (
    "CAST(GREATEST(0, LEAST(1048575,"
    " floor((lon + 180.0) / 360.0 * 1048576.0))) AS BIGINT)"
)
GEOHASH_MY_SQL = (
    "CAST(GREATEST(0, LEAST(1048575,"
    " floor((lat + 90.0) / 180.0 * 1048576.0))) AS BIGINT)"
)


# ---------------- S2 cell ids (stages/s2.py bit-exact SQL twin) -------------

S2X_MULT = 3266489917  # xxhash-family odd primes, distinct from LON/LAT
S2Y_MULT = 668265263
S2Z_MULT = 374761393


def s2_direction_ids(ids: "np.ndarray") -> tuple:
    """doc_id -> direction vector in [-1, 1)^3 (need not be unit: the S2
    face projection is scale-invariant).  Every operation is one exact /
    correctly-rounded IEEE double op (integer hash, divide by 2^32,
    multiply by 2, subtract 1), so the SQL twin in s2_cell_sql produces
    bit-identical coordinates — the trick that lets the full S2 pipeline
    (face CASE, u/v divide, quadratic sqrt, floor, Hilbert lookup joins)
    stay under a bit-exact DuckDB oracle without trig."""
    i = np.asarray(ids, dtype=np.int64)
    x = ((i * S2X_MULT) % HASH_MOD).astype(np.float64) / HASH_MOD * 2.0 - 1.0
    y = ((i * S2Y_MULT) % HASH_MOD).astype(np.float64) / HASH_MOD * 2.0 - 1.0
    z = ((i * S2Z_MULT) % HASH_MOD).astype(np.float64) / HASH_MOD * 2.0 - 1.0
    return x, y, z


def s2_direction_batch(batch):
    """map_batches fn: append x/y/z direction columns from doc_id."""
    import pyarrow as pa

    x, y, z = s2_direction_ids(batch.column("doc_id").to_numpy())
    return (
        batch.append_column("x", pa.array(x))
        .append_column("y", pa.array(y))
        .append_column("z", pa.array(z))
    )


def s2_cell_sql(level: int = 12, parent_level: int = 8, from_rel: str = "ids") -> str:
    """SQL computing S2 cell ids for (doc_id) rows in ``from_rel``,
    bit-identical to stages.s2.s2_cell_from_xyz over s2_direction_ids:
    the 1024-entry Hilbert orientation lookup table is embedded as a
    VALUES relation joined once per 4-bit chunk (8 chained CTEs), float
    steps reproduce the numpy ops one-for-one, and the final id math runs
    in HUGEINT before casting to UBIGINT.  Returns a relation
    (doc_id, s2_id, s2_parent{parent_level})."""
    from .stages.s2 import LOOKUP_POS

    lut_rows = ", ".join(f"({b}, {int(v)})" for b, v in enumerate(LOOKUP_POS))
    two32 = float(HASH_MOD)
    n30 = 1 << 30
    st_i = (
        "LEAST(GREATEST(CAST(FLOOR((CASE WHEN u >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * u)"
        f" ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * u) END) * {float(n30)}) AS BIGINT), 0), {n30 - 1})"
    )
    st_j = st_i.replace(" u ", " v ").replace("* u)", "* v)")
    parts = [
        "s2lut AS (SELECT CAST(b AS BIGINT) AS b, CAST(lv AS BIGINT) AS lv"
        f" FROM (VALUES {lut_rows}) t(b, lv))",
        f"""s2base AS (
      SELECT doc_id,
        ((doc_id * {S2X_MULT}) % {HASH_MOD}) / {two32} * 2.0 - 1.0 AS x,
        ((doc_id * {S2Y_MULT}) % {HASH_MOD}) / {two32} * 2.0 - 1.0 AS y,
        ((doc_id * {S2Z_MULT}) % {HASH_MOD}) / {two32} * 2.0 - 1.0 AS z
      FROM {from_rel})""",
        """s2face AS (
      SELECT doc_id, x, y, z,
        CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z)
               THEN CASE WHEN x > 0 THEN 0 ELSE 3 END
             WHEN abs(y) >= abs(z)
               THEN CASE WHEN y > 0 THEN 1 ELSE 4 END
             ELSE CASE WHEN z > 0 THEN 2 ELSE 5 END END AS face
      FROM s2base)""",
        """s2uv AS (
      SELECT doc_id, face,
        CASE face WHEN 0 THEN y / x WHEN 1 THEN -x / y WHEN 2 THEN -x / z
                  WHEN 3 THEN z / x WHEN 4 THEN z / y ELSE -y / z END AS u,
        CASE face WHEN 0 THEN z / x WHEN 1 THEN z / y WHEN 2 THEN -y / z
                  WHEN 3 THEN y / x WHEN 4 THEN -x / y ELSE -x / z END AS v
      FROM s2face)""",
        f"""s2ij AS (
      SELECT doc_id, face, {st_i} AS i, {st_j} AS j FROM s2uv)""",
        f"""s2k8 AS (
      SELECT doc_id, i, j, face * {1 << 60} AS n, face % 2 AS bits FROM s2ij)""",
    ]
    for k in range(7, -1, -1):
        ext = 1 << (4 * k)
        place = 1 << (8 * k)
        prev = "s2k8" if k == 7 else f"s2k{k + 1}"
        parts.append(
            f"""s2k{k} AS (
      SELECT t.doc_id, t.i, t.j,
        t.n + (l.lv // 4) * {place} AS n, l.lv % 4 AS bits
      FROM {prev} t JOIN s2lut l
        ON l.b = ((t.i // {ext}) % 16) * 64 + ((t.j // {ext}) % 16) * 4 + t.bits)"""
        )
    kk = 61 - 2 * level
    kp = 61 - 2 * parent_level
    parts.append(
        f"""s2fin AS (
      SELECT doc_id,
        (CAST(n AS HUGEINT) * 2 + 1) AS leaf
      FROM s2k0)"""
    )
    ctes = ",\n    ".join(parts)
    return f"""{ctes}
    SELECT doc_id,
      CAST((leaf // {1 << kk}) * {1 << kk} + {1 << (kk - 1)} AS UBIGINT) AS s2_id,
      CAST((leaf // {1 << kp}) * {1 << kp} + {1 << (kp - 1)} AS UBIGINT) AS s2_parent{parent_level}
    FROM s2fin"""


def substr_dup_sql(k: int = 20, from_rel: str = "documents") -> str:
    """SQL twin of stages.dedup.substr_dup_spans: per-position double
    rolling hash in sum form (weights B^(k-1-t) mod 2^32 as embedded
    constants; every term < 2^53 so the HUGEINT SUM is exact), global
    count >= 2, then the gaps-and-islands merge into [start, end) spans."""
    from .stages.dedup import _M32, _SUBSTR_B1, _SUBSTR_B2

    offs = ", ".join(
        f"({t}, {pow(_SUBSTR_B1, k - 1 - t, _M32)}, {pow(_SUBSTR_B2, k - 1 - t, _M32)})"
        for t in range(k)
    )
    return f"""sdocs AS (SELECT doc_id, text FROM {from_rel}),
    spos AS (SELECT doc_id, text,
        unnest(generate_series(1, length(text) - {k} + 1)) AS p FROM sdocs),
    soffs(t, w1, w2) AS (VALUES {offs}),
    shashed AS (
      SELECT doc_id, p,
        CAST(SUM(unicode(substr(text, CAST(p + t AS INT), 1)) * w1) % {_M32} AS BIGINT) AS h1,
        CAST(SUM(unicode(substr(text, CAST(p + t AS INT), 1)) * w2) % {_M32} AS BIGINT) AS h2
      FROM spos, soffs GROUP BY doc_id, p),
    sdupg AS (SELECT h1, h2 FROM shashed GROUP BY h1, h2 HAVING count(*) >= 2),
    smarked AS (SELECT doc_id, p FROM shashed JOIN sdupg USING (h1, h2)),
    slagd AS (SELECT doc_id, p,
        LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS pp FROM smarked),
    sisl AS (SELECT doc_id, p,
        SUM(CASE WHEN pp IS NULL OR p > pp + {k} THEN 1 ELSE 0 END)
          OVER (PARTITION BY doc_id ORDER BY p) AS g FROM slagd)
    SELECT doc_id, MIN(p) - 1 AS span_start, MAX(p) - 1 + {k} AS span_end
    FROM sisl GROUP BY doc_id, g"""
