"""Result-table sinks beyond parquet/CSV: dBase DBF (the attribute table of
an ESRI Shapefile) and NetCDF-3 classic — the two GDALWriter targets
(/root/reference/src/exactextract/src/gdal_writer.cpp:26-143) that are
representable without GDAL. Both formats are simple public specifications
(dBase III header+records; NetCDF classic CDF-1), written here directly.

Scale contract: these are RESULT sinks — one row per zone — so the tables
are small by design (the per-cell/streaming outputs stay on parquet). The
writers take a pandas DataFrame; ``write_result`` dispatches on extension
so the CLI's ``-o`` accepts .parquet/.csv/.dbf/.nc uniformly.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd


def write_dbf(df: pd.DataFrame, path: str) -> None:
    """dBase III DBF: numeric columns as 'N' (width 18, 6 decimals for
    floats, 0 for ints), everything else as 'C' strings (width <= 254)."""
    n = len(df)
    fields = []  # (name, type, width, decimals)
    encoders = []
    for col in df.columns:
        name = str(col)[:10]
        s = df[col]
        if pd.api.types.is_integer_dtype(s):
            fields.append((name, b"N", 18, 0))
            encoders.append(lambda v: b"" if pd.isna(v) else f"{int(v):18d}".encode())
        elif pd.api.types.is_float_dtype(s):
            fields.append((name, b"N", 18, 6))
            encoders.append(
                lambda v: b" " * 18 if pd.isna(v) else f"{float(v):18.6f}".encode()
            )
        else:
            width = max(1, min(254, int(s.astype(str).str.len().max() or 1)))
            fields.append((name, b"C", width, 0))
            encoders.append(
                lambda v, w=width: str(v)[:w].ljust(w).encode("ascii", "replace")
            )
    header_len = 32 + 32 * len(fields) + 1
    record_len = 1 + sum(f[2] for f in fields)
    with open(path, "wb") as f:
        f.write(
            struct.pack(
                "<BBBBIHH20x",
                0x03, 124, 1, 1,  # dBase III, fake date 2024-01-01
                n, header_len, record_len,
            )
        )
        for (name, typ, width, dec) in fields:
            f.write(
                struct.pack(
                    "<11sc4xBB14x",
                    name.encode("ascii", "replace")[:11],
                    typ,
                    width,
                    dec,
                )
            )
        f.write(b"\x0d")
        for i in range(n):
            f.write(b" ")  # not deleted
            for j, (fld, enc) in enumerate(zip(fields, encoders)):
                cell = enc(df.iloc[i, j])
                f.write(cell.rjust(fld[2]) if fld[1] == b"N" else cell)
        f.write(b"\x1a")


def read_dbf(path: str) -> pd.DataFrame:
    """Minimal DBF reader (round-trip validation)."""
    with open(path, "rb") as f:
        data = f.read()
    n, header_len, record_len = struct.unpack("<IHH", data[4:12])
    fields = []
    off = 32
    while data[off] != 0x0D:
        name = data[off : off + 11].split(b"\x00")[0].decode()
        typ = chr(data[off + 11])
        width = data[off + 16]
        dec = data[off + 17]
        fields.append((name, typ, width, dec))
        off += 32
    rows = []
    p = header_len
    for _ in range(n):
        rec = data[p : p + record_len]
        p += record_len
        vals = []
        q = 1
        for (name, typ, width, dec) in fields:
            raw = rec[q : q + width].decode("ascii", "replace")
            q += width
            if typ == "N":
                raw = raw.strip()
                vals.append(
                    (float(raw) if dec else int(raw)) if raw else np.nan
                )
            else:
                vals.append(raw.rstrip())
        rows.append(vals)
    return pd.DataFrame(rows, columns=[f[0] for f in fields])


def write_netcdf3(df: pd.DataFrame, path: str) -> None:
    """NetCDF-3 classic (CDF-1): one unlimited-free dimension ``row`` of
    len(df); numeric columns as double/int variables, strings as char
    arrays with a per-column ``strN`` dimension."""
    n = len(df)
    NC_DIMENSION, NC_VARIABLE = 10, 11
    NC_INT, NC_DOUBLE, NC_CHAR = 4, 6, 2

    def pad4(b: bytes) -> bytes:
        return b + b"\x00" * ((4 - len(b) % 4) % 4)

    def nc_string(s: str) -> bytes:
        e = s.encode()
        return struct.pack(">I", len(e)) + pad4(e)

    dims = [("row", n)]
    cols = []
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_integer_dtype(s):
            cols.append((str(col), NC_INT, None, s.to_numpy(np.int32)))
        elif pd.api.types.is_float_dtype(s):
            cols.append((str(col), NC_DOUBLE, None, s.to_numpy(np.float64)))
        else:
            vals = s.astype(str).to_numpy()
            width = max(1, int(max((len(v) for v in vals), default=1)))
            dim_name = f"str_{col}"
            dims.append((dim_name, width))
            cols.append((str(col), NC_CHAR, len(dims) - 1, vals))

    # variable layout: vsize then offsets after the header
    header = b"CDF\x01" + struct.pack(">I", 0)  # numrecs = 0 (no record dim)
    header += struct.pack(">II", NC_DIMENSION, len(dims))
    for name, size in dims:
        header += nc_string(name) + struct.pack(">I", size)
    header += struct.pack(">II", 0, 0)  # no global attributes (NC_ABSENT)
    # first pass to compute sizes
    var_entries = []
    for name, typ, extra_dim, vals in cols:
        if typ == NC_CHAR:
            vsize = n * dims[extra_dim][1]
        elif typ == NC_INT:
            vsize = n * 4
        else:
            vsize = n * 8
        vsize += (4 - vsize % 4) % 4
        var_entries.append((name, typ, extra_dim, vals, vsize))

    def var_header(name, typ, extra_dim, vsize, offset):
        b = nc_string(name)
        dimids = [0] + ([extra_dim] if extra_dim is not None else [])
        b += struct.pack(">I", len(dimids))
        for d in dimids:
            b += struct.pack(">I", d)
        b += struct.pack(">II", 0, 0)  # no attributes
        b += struct.pack(">III", typ, vsize, offset)
        return b

    # compute header length with a placeholder pass
    base = len(header) + struct.pack(">II", NC_VARIABLE, len(var_entries)).__len__()
    hlen = base
    for name, typ, extra_dim, vals, vsize in var_entries:
        hlen += len(var_header(name, typ, extra_dim, vsize, 0))
    offset = hlen
    body = struct.pack(">II", NC_VARIABLE, len(var_entries))
    payloads = []
    for name, typ, extra_dim, vals, vsize in var_entries:
        body += var_header(name, typ, extra_dim, vsize, offset)
        if typ == NC_CHAR:
            width = dims[extra_dim][1]
            raw = b"".join(
                v.encode("ascii", "replace")[:width].ljust(width, b"\x00")
                for v in vals
            )
        elif typ == NC_INT:
            raw = np.asarray(vals, dtype=">i4").tobytes()
        else:
            raw = np.asarray(vals, dtype=">f8").tobytes()
        payloads.append(pad4(raw))
        offset += vsize
    with open(path, "wb") as f:
        f.write(header + body)
        for p in payloads:
            f.write(p)


def read_netcdf3(path: str) -> pd.DataFrame:
    """Minimal CDF-1 reader (round-trip validation)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"CDF\x01"
    pos = 8

    def u32():
        nonlocal pos
        v = struct.unpack(">I", data[pos : pos + 4])[0]
        pos += 4
        return v

    def s_():
        nonlocal pos
        ln = u32()
        v = data[pos : pos + ln].decode()
        pos += ln + ((4 - ln % 4) % 4)
        return v

    tag, ndims = u32(), u32()
    dims = [(s_(), u32()) for _ in range(ndims)]
    u32(), u32()  # gatt absent
    tag, nvars = u32(), u32()
    out = {}
    n = dims[0][1]
    for _ in range(nvars):
        name = s_()
        nd = u32()
        dimids = [u32() for _ in range(nd)]
        u32(), u32()  # attrs absent
        typ, vsize, off = u32(), u32(), u32()
        if typ == 2:  # char
            width = dims[dimids[1]][1]
            raw = data[off : off + n * width]
            out[name] = [
                raw[i * width : (i + 1) * width].split(b"\x00")[0].decode()
                for i in range(n)
            ]
        elif typ == 4:
            out[name] = np.frombuffer(data, dtype=">i4", count=n, offset=off).astype(
                np.int64
            )
        else:
            out[name] = np.frombuffer(data, dtype=">f8", count=n, offset=off)
    return pd.DataFrame(out)


def _shp_rings(wkb: bytes) -> list[np.ndarray]:
    """WKB -> shapefile ring list: shells CW, holes CCW (the ESRI
    convention — our parser normalizes the opposite way, so every ring
    reverses), multipolygon parts flattened into one Polygon record."""
    from .. import wkbio

    rings: list[np.ndarray] = []
    for part in wkbio.polygon_parts(wkbio.parse_wkb(wkb)):
        for ring in part["rings"]:
            rings.append(np.ascontiguousarray(ring[::-1], dtype=np.float64))
    return rings


#: ESRI WKT for WGS84 geographic coordinates (the .prj sidecar default)
_WGS84_PRJ = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",'
    '6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],'
    'UNIT["Degree",0.0174532925199433]]'
)


def write_shp(
    df: pd.DataFrame,
    path: str,
    geoms: list[bytes | None],
    prj_wkt: str | None = _WGS84_PRJ,
) -> None:
    """ESRI Shapefile (.shp + .shx + .dbf), pure struct — the GDALWriter
    '-o out.shp' target (/root/reference/src/exactextract/src/
    gdal_writer.cpp:26-143) without GDAL. One Polygon record per row
    (multipolygons become multi-part records; None -> Null Shape), plus the
    attribute table via :func:`write_dbf`.

    Spec: the public ESRI Shapefile Technical Description (July 1998) —
    100-byte headers, big-endian record framing, little-endian geometry.
    """
    assert path.endswith(".shp")
    if len(geoms) != len(df):
        raise ValueError("geoms must align 1:1 with df rows")

    records = []  # (content bytes,)
    gxmin = gymin = np.inf
    gxmax = gymax = -np.inf
    for wkb in geoms:
        rings = _shp_rings(wkb) if wkb is not None else []
        if not rings:
            records.append(struct.pack("<i", 0))  # Null Shape
            continue
        pts = np.concatenate(rings)
        xmin, ymin = pts.min(axis=0)
        xmax, ymax = pts.max(axis=0)
        gxmin, gymin = min(gxmin, xmin), min(gymin, ymin)
        gxmax, gymax = max(gxmax, xmax), max(gymax, ymax)
        parts = np.zeros(len(rings), dtype=np.int64)
        np.cumsum([len(r) for r in rings[:-1]], out=parts[1:])
        content = struct.pack("<i4dii", 5, xmin, ymin, xmax, ymax,
                              len(rings), len(pts))
        content += parts.astype("<i4").tobytes()
        content += pts.astype("<f8").tobytes()
        records.append(content)

    if not np.isfinite(gxmin):
        gxmin = gymin = gxmax = gymax = 0.0

    def header(file_words: int) -> bytes:
        return (
            struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, file_words)
            + struct.pack("<ii4d", 1000, 5, gxmin, gymin, gxmax, gymax)
            + struct.pack("<4d", 0, 0, 0, 0)
        )

    shp_words = 50 + sum(4 + len(c) // 2 for c in records)
    shx_words = 50 + 4 * len(records)
    with open(path, "wb") as fshp, open(path[:-4] + ".shx", "wb") as fshx:
        fshp.write(header(shp_words))
        fshx.write(header(shx_words))
        offset = 50
        for i, content in enumerate(records, 1):
            clen = len(content) // 2
            fshx.write(struct.pack(">ii", offset, clen))
            fshp.write(struct.pack(">ii", i, clen))
            fshp.write(content)
            offset += 4 + clen
    write_dbf(df, path[:-4] + ".dbf")
    if prj_wkt:
        with open(path[:-4] + ".prj", "w") as fprj:
            fprj.write(prj_wkt)


def read_shp(path: str) -> list[list[np.ndarray]]:
    """Minimal .shp reader (round-trip validation): list of ring lists per
    record, Null Shapes as empty lists."""
    with open(path, "rb") as f:
        data = f.read()
    (file_words,) = struct.unpack(">i", data[24:28])
    assert struct.unpack(">i", data[:4])[0] == 9994
    assert struct.unpack("<i", data[32:36])[0] == 5
    out: list[list[np.ndarray]] = []
    pos = 100
    while pos < file_words * 2:
        _, clen = struct.unpack(">ii", data[pos : pos + 8])
        pos += 8
        (stype,) = struct.unpack("<i", data[pos : pos + 4])
        if stype == 0:
            out.append([])
        else:
            assert stype == 5
            nparts, npoints = struct.unpack("<ii", data[pos + 36 : pos + 44])
            parts = np.frombuffer(data, "<i4", nparts, pos + 44)
            pts = np.frombuffer(
                data, "<f8", npoints * 2, pos + 44 + 4 * nparts
            ).reshape(npoints, 2)
            bounds = np.append(parts, npoints)
            out.append(
                [pts[bounds[i] : bounds[i + 1]].copy() for i in range(nparts)]
            )
        pos += clen * 2
    return out


# ---------------- SQLite / GeoPackage sinks ----------------
# The reference's GDALWriter reaches databases through OGR (PostgreSQL in
# gdal_writer.cpp:26-143); this environment has no DB server, so the
# equivalent database sink is SQLite (stdlib) — plain tables for .db/.sqlite
# and a standards-conformant GeoPackage for .gpkg (round-trips through this
# engine's own gpkg reader).

_SQLITE_TYPES = {"i": "INTEGER", "u": "INTEGER", "b": "INTEGER",
                 "f": "REAL", "O": "TEXT", "S": "BLOB"}


def _sqlite_coltype(s: pd.Series) -> str:
    if len(s) and isinstance(s.iloc[0], (bytes, bytearray)):
        return "BLOB"
    return _SQLITE_TYPES.get(s.dtype.kind, "TEXT")


def write_sqlite(
    df: pd.DataFrame, path: str, table: str = "results", geoms=None
) -> None:
    """Attribute table -> a SQLite database (stdlib sqlite3). ``geoms``
    (one WKB per row) adds a ``geom_wkb`` BLOB column. Replaces the table
    if it exists (the GDALWriter overwrite contract)."""
    import sqlite3

    con = sqlite3.connect(path)
    try:
        cols = [f'"{c}" {_sqlite_coltype(df[c])}' for c in df.columns]
        if geoms is not None:
            cols.append('"geom_wkb" BLOB')
        con.execute(f'DROP TABLE IF EXISTS "{table}"')
        con.execute(f'CREATE TABLE "{table}" ({", ".join(cols)})')
        n = len(df.columns) + (1 if geoms is not None else 0)
        rows = []
        for i, row in enumerate(df.itertuples(index=False)):
            vals = [
                (v.item() if isinstance(v, np.generic) else v) for v in row
            ]
            if geoms is not None:
                vals.append(sqlite3.Binary(geoms[i]))
            rows.append(vals)
        con.executemany(
            f'INSERT INTO "{table}" VALUES ({", ".join("?" * n)})', rows
        )
        con.commit()
    finally:
        con.close()


def read_sqlite(path: str, table: str = "results") -> pd.DataFrame:
    import sqlite3

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        cur = con.execute(f'SELECT * FROM "{table}"')
        cols = [d[0] for d in cur.description]
        return pd.DataFrame(cur.fetchall(), columns=cols)
    finally:
        con.close()


def _wkb_envelope(wkb: bytes) -> tuple[float, float, float, float]:
    from .. import wkbio

    xs: list[float] = []
    ys: list[float] = []
    for part in wkbio.parse_wkb(wkb):
        arrays = part.get("rings") or [part["coords"]]
        for a in arrays:
            xs.extend((float(a[:, 0].min()), float(a[:, 0].max())))
            ys.extend((float(a[:, 1].min()), float(a[:, 1].max())))
    return min(xs), max(xs), min(ys), max(ys)


def write_gpkg(
    df: pd.DataFrame,
    path: str,
    geoms,
    layer: str = "results",
    srs_id: int = 4326,
) -> None:
    """Results + geometries -> a GeoPackage (OGC GPKG 1.2 core: the
    application_id pragma, gpkg_spatial_ref_sys / gpkg_contents /
    gpkg_geometry_columns registry rows, and GP-header geometry BLOBs with
    little-endian envelopes). Round-trips through sources.gpkg's reader."""
    import sqlite3

    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
        con.execute("PRAGMA user_version = 10200")
        con.execute(
            """CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
            srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
            organization TEXT NOT NULL, organization_coordsys_id INTEGER
            NOT NULL, definition TEXT NOT NULL, description TEXT)"""
        )
        con.executemany(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [
                ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
                ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
                ("WGS 84 geodetic", 4326, "EPSG", 4326,
                 'GEOGCS["WGS 84",DATUM["WGS_1984",'
                 'SPHEROID["WGS 84",6378137,298.257223563]]]', None),
            ],
        )
        if srs_id not in (-1, 0, 4326):
            con.execute(
                "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
                (f"EPSG:{srs_id}", srs_id, "EPSG", srs_id,
                 f"EPSG:{srs_id}", None),
            )
        con.execute(
            """CREATE TABLE IF NOT EXISTS gpkg_contents (
            table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
            identifier TEXT UNIQUE, description TEXT DEFAULT '',
            last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
            max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"""
        )
        con.execute(
            """CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
            table_name TEXT NOT NULL, column_name TEXT NOT NULL,
            geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
            z TINYINT NOT NULL, m TINYINT NOT NULL,
            CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"""
        )
        attr_cols = ", ".join(
            f'"{c}" {_sqlite_coltype(df[c])}' for c in df.columns
        )
        con.execute(f'DROP TABLE IF EXISTS "{layer}"')
        con.execute(
            f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
            f'{attr_cols}, geom GEOMETRY)'
        )
        envs = [_wkb_envelope(g) for g in geoms]
        rows = []
        for i, row in enumerate(df.itertuples(index=False)):
            xmin, xmax, ymin, ymax = envs[i]
            # GP header: magic, version 0, flags 0x03 (little-endian,
            # envelope indicator 1 = [minx maxx miny maxy]), srs_id, envelope
            blob = (
                b"GP\x00\x03"
                + struct.pack("<i", srs_id)
                + struct.pack("<4d", xmin, xmax, ymin, ymax)
                + bytes(geoms[i])
            )
            rows.append(
                [(v.item() if isinstance(v, np.generic) else v) for v in row]
                + [sqlite3.Binary(blob)]
            )
        n = len(df.columns) + 1
        names = ", ".join(f'"{c}"' for c in df.columns) + ", geom"
        con.executemany(
            f'INSERT INTO "{layer}" ({names}) VALUES ({", ".join("?" * n)})',
            rows,
        )
        con.execute("DELETE FROM gpkg_contents WHERE table_name = ?", (layer,))
        con.execute(
            "INSERT INTO gpkg_contents VALUES (?,?,?,?,datetime('now'),"
            "?,?,?,?,?)",
            (layer, "features", layer, "",
             min(e[0] for e in envs), min(e[2] for e in envs),
             max(e[1] for e in envs), max(e[3] for e in envs), srs_id),
        )
        con.execute(
            "DELETE FROM gpkg_geometry_columns WHERE table_name = ?", (layer,)
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
            (layer, "geom", "GEOMETRY", srs_id),
        )
        con.commit()
    finally:
        con.close()


def write_result(df: pd.DataFrame, path: str, geoms=None) -> None:
    """Extension-dispatched result sink: .parquet / .csv / .dbf / .nc /
    .db/.sqlite (SQLite table) / .gpkg (GeoPackage, requires ``geoms``) /
    .shp (requires ``geoms``: one WKB per row)."""
    if path.endswith(".csv"):
        df.to_csv(path, index=False)
    elif path.endswith(".dbf"):
        write_dbf(df, path)
    elif path.endswith(".nc"):
        write_netcdf3(df, path)
    elif path.endswith(".db") or path.endswith(".sqlite"):
        write_sqlite(df, path, geoms=geoms)
    elif path.endswith(".gpkg"):
        if geoms is None:
            raise ValueError(".gpkg output needs zone geometries")
        write_gpkg(df, path, geoms)
    elif path.endswith(".shp"):
        if geoms is None:
            raise ValueError(".shp output needs zone geometries")
        write_shp(df, path, geoms)
    elif path.endswith(".pgsql"):
        write_pgsql_script(df, path, geoms=geoms)
    else:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


# ---------------- PostgreSQL COPY-script sink ----------------

_PG_TYPES = {
    "i": "BIGINT",
    "u": "BIGINT",
    "f": "DOUBLE PRECISION",
    "b": "BOOLEAN",
}


def _pg_ident(name: str) -> str:
    """Double-quoted PostgreSQL identifier (embedded quotes doubled)."""
    return '"' + str(name).replace('"', '""') + '"'


def _pg_copy_escape(v) -> str:
    """COPY text-format escaping (PostgreSQL docs, COPY chapter): NULL is
    \\N; backslash, tab, newline and carriage return are escaped."""
    if v is None or (isinstance(v, float) and v != v) or pd.isna(v):
        return "\\N"
    if isinstance(v, (bool, np.bool_)):
        return "t" if v else "f"
    if isinstance(v, (bytes, bytearray)):
        return "\\\\x" + bytes(v).hex()
    s = str(v)
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def write_pgsql_script(
    df: pd.DataFrame,
    path: str,
    table: str = "results",
    geoms: list | None = None,
) -> None:
    """PostgreSQL sink as a REPLAYABLE SQL SCRIPT: ``CREATE TABLE`` +
    ``COPY ... FROM stdin`` in the documented text format (tab-delimited,
    ``\\N`` NULLs, backslash escapes), terminated by ``\\.`` — exactly
    what ``psql -f`` ingests. The reference writes result tables to
    PostgreSQL through GDAL's PG driver
    (/root/reference/src/exactextract/src/gdal_writer.cpp:26-143); this
    environment has no server, so the sink produces the offline artifact
    that loads into one, keeping the output contract (types, NULLs,
    geometry as EWKB hex in a BYTEA column when ``geoms`` is given).

    Scale contract: a RESULT sink (one row per zone), like the other
    writers in this module — per-cell outputs stay on parquet.
    """
    cols = list(df.columns)
    defs = []
    for c in cols:
        kind = df[c].dtype.kind
        defs.append(f"{_pg_ident(c)} {_PG_TYPES.get(kind, 'TEXT')}")
    if geoms is not None:
        if len(geoms) != len(df):
            raise ValueError("geoms length must match the result rows")
        defs.append(f"{_pg_ident('geom_wkb')} BYTEA")
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"CREATE TABLE IF NOT EXISTS {_pg_ident(table)} (\n    "
                + ",\n    ".join(defs) + "\n);\n")
        copy_cols = ", ".join(_pg_ident(c) for c in cols)
        if geoms is not None:
            copy_cols += ", " + _pg_ident("geom_wkb")
        f.write(f"COPY {_pg_ident(table)} ({copy_cols}) FROM stdin;\n")
        for i in range(len(df)):
            vals = [_pg_copy_escape(df.iloc[i][c]) for c in cols]
            if geoms is not None:
                vals.append(_pg_copy_escape(bytes(geoms[i])))
            f.write("\t".join(vals) + "\n")
        f.write("\\.\n")


def read_pgsql_script(path: str, table: str | None = None) -> pd.DataFrame:
    """Parse back a ``write_pgsql_script`` artifact (round-trip check and
    a loader for environments without psql): reads the COPY block,
    reversing the text-format escapes."""
    import re

    text = open(path, encoding="utf-8").read()
    m = re.search(r"COPY\s+(\S+|\"[^\"]*\")\s*\(([^)]*)\)\s+FROM stdin;\n",
                  text)
    if m is None:
        raise ValueError("no COPY block found")
    cols = [c.strip().strip('\"').replace('\"\"', '\"')
            for c in m.group(2).split(",")]
    body = text[m.end():]
    end = body.index("\\.\n")
    rows = []
    for line in body[:end].splitlines():
        out = []
        for tok in line.split("\t"):
            if tok == "\\N":
                out.append(None)
            elif tok.startswith("\\\\x"):
                out.append(bytes.fromhex(tok[3:]))
            else:
                out.append(
                    tok.replace("\\t", "\t").replace("\\n", "\n")
                    .replace("\\r", "\r").replace("\\\\", "\\")
                )
        rows.append(out)
    return pd.DataFrame(rows, columns=cols)
