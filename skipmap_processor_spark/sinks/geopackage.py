"""GeoPackage sink (SURVEY §2.1 S13) — stdlib sqlite3 + hand-rolled WKB.

The reference's GeoPackageWriter (/root/reference/src/io/
GeoPackageWriter.ts:755-1148) converts the final GeoJSON feature set into
a GeoPackage. A GeoPackage is a single SQLite file conforming to OGC
12-128r19: `application_id = 'GPKG'`, the `gpkg_spatial_ref_sys` /
`gpkg_contents` / `gpkg_geometry_columns` metadata tables, and one table
per feature layer whose geometry column holds GeoPackageBinary blobs
(an 8-byte header + envelope, then standard ISO WKB).

Spark-first split of the work:

- **geometry encode is distributed**: ``encode_point_layer`` /
  ``encode_line_layer`` build the GeoPackageBinary blob with an
  Arrow-batched pandas UDF (IEEE-double byte packing has no JVM
  built-in) — embarrassingly parallel, runs where the data lives, so
  at 100 TB the encode scales with the cluster;
- **the file write is a driver sink by format contract**: SQLite is a
  single-writer file, exactly as in the reference (one process writes
  the .gpkg). ``write_geopackage`` streams the encoded rows with
  ``toLocalIterator`` (one partition in memory at a time, never a full
  collect) into batched INSERTs.

A matching reader (``read_geopackage``) exists for round-trip tests and
small lookups; it is not a scan path.
"""

from __future__ import annotations

import os
import sqlite3
import struct
from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GPKG_APPLICATION_ID = 0x47504B47  # 'GPKG'
GPKG_USER_VERSION = 10300  # 1.3.0
_SQL_TYPES = {
    "bigint": "INTEGER", "int": "INTEGER", "integer": "INTEGER",
    "smallint": "INTEGER", "tinyint": "INTEGER", "boolean": "INTEGER",
    "double": "REAL", "float": "REAL",
    "string": "TEXT", "date": "TEXT", "timestamp": "TEXT",
    "binary": "BLOB",
}


def wkb_point(lon: float, lat: float) -> bytes:
    """ISO WKB for POINT (x=lon, y=lat), little endian."""
    return struct.pack("<BIdd", 1, 1, float(lon), float(lat))


def wkb_linestring(coords: Iterable[tuple[float, float]]) -> bytes:
    pts = list(coords)
    out = [struct.pack("<BII", 1, 2, len(pts))]
    out += [struct.pack("<dd", float(x), float(y)) for x, y in pts]
    return b"".join(out)


def gpkg_blob(wkb: bytes, envelope: tuple[float, float, float, float],
              srs_id: int = 4326) -> bytes:
    """GeoPackageBinary header (little endian, envelope code 1) + WKB."""
    flags = 0x01 | (1 << 1)  # LE byte order, envelope = [minx,maxx,miny,maxy]
    minx, maxx, miny, maxy = envelope
    return (struct.pack("<2sBBi", b"GP", 0, flags, srs_id)
            + struct.pack("<4d", minx, maxx, miny, maxy) + wkb)


def parse_gpkg_blob(blob: bytes) -> tuple[int, list[tuple[float, float]]]:
    """(wkb_geometry_type, coordinates) from a GeoPackageBinary blob —
    the round-trip verifier used by tests and read_geopackage."""
    magic, _ver, flags, _srs = struct.unpack_from("<2sBBi", blob, 0)
    if magic != b"GP":
        raise ValueError("not a GeoPackageBinary blob")
    env_code = (flags >> 1) & 0x07
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env_code]
    off = 8 + env_len
    byte_order = blob[off]
    fmt = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(f"{fmt}I", blob, off + 1)
    if gtype == 1:
        x, y = struct.unpack_from(f"{fmt}dd", blob, off + 5)
        return 1, [(x, y)]
    if gtype == 2:
        (n,) = struct.unpack_from(f"{fmt}I", blob, off + 5)
        coords = []
        p = off + 9
        for _ in range(n):
            x, y = struct.unpack_from(f"{fmt}dd", blob, p)
            coords.append((x, y))
            p += 16
        return 2, coords
    raise ValueError(f"unsupported wkb type {gtype}")


def encode_point_layer(df: DataFrame, lon_col: str = "lon",
                       lat_col: str = "lat") -> DataFrame:
    """Distributed GPKG-blob encode for a point layer: adds ``_geom``
    (binary) and drops the raw coordinate columns. Arrow-batched pandas
    UDF — struct packing is not expressible with JVM built-ins, but the
    encode is embarrassingly parallel and runs where the data lives."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            [gpkg_blob(wkb_point(x, y), (x, x, y, y))
             for x, y in zip(lon, lat)],
            dtype=object,
        )

    return df.withColumn("_geom", _enc(F.col(lon_col), F.col(lat_col))) \
             .drop(lon_col, lat_col)


def encode_line_layer(df: DataFrame, coords_col: str = "coords") -> DataFrame:
    """Distributed encode for a linestring layer; ``coords_col`` is an
    array<struct<lon:double,lat:double>> (or array<array<double>>)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _enc(coords: pd.Series) -> pd.Series:
        out = []
        for cs in coords:
            pts = [(float(c["lon"]), float(c["lat"]))
                   if hasattr(c, "keys") or isinstance(c, dict)
                   else (float(c[0]), float(c[1])) for c in cs]
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            out.append(gpkg_blob(wkb_linestring(pts),
                                 (min(xs), max(xs), min(ys), max(ys))))
        return pd.Series(out, dtype=object)

    return df.withColumn("_geom", _enc(F.col(coords_col))).drop(coords_col)


def _init_gpkg(con: sqlite3.Connection) -> None:
    con.execute(f"PRAGMA application_id = {GPKG_APPLICATION_ID}")
    con.execute(f"PRAGMA user_version = {GPKG_USER_VERSION}")
    con.execute("""CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
        srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
        organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
        definition TEXT NOT NULL, description TEXT)""")
    con.executemany(
        "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        [
            ("WGS 84 geodetic", 4326, "EPSG", 4326,
             'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
             '6378137,298.257223563]],PRIMEM["Greenwich",0],'
             'UNIT["degree",0.0174532925199433]]',
             "longitude/latitude on WGS 84"),
            ("Undefined cartesian SRS", -1, "NONE", -1, "undefined",
             "undefined cartesian coordinate reference system"),
            ("Undefined geographic SRS", 0, "NONE", 0, "undefined",
             "undefined geographic coordinate reference system"),
        ],
    )
    con.execute("""CREATE TABLE IF NOT EXISTS gpkg_contents (
        table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
        identifier TEXT UNIQUE, description TEXT DEFAULT '',
        last_change DATETIME NOT NULL DEFAULT
          (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
        min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
        srs_id INTEGER)""")
    con.execute("""CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
        table_name TEXT NOT NULL, column_name TEXT NOT NULL,
        geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
        z TINYINT NOT NULL, m TINYINT NOT NULL,
        CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""")


def write_geopackage(df: DataFrame, path: str, layer: str,
                     geometry_type: str = "POINT",
                     srs_id: int = 4326, batch_rows: int = 2000) -> dict:
    """Write an encoded layer (``_geom`` binary column + attribute
    columns) into ``path`` as GeoPackage table ``layer``.

    Multiple calls with different layers append to the same file, like
    the reference writer's per-layer tables. Returns
    {"rows": n, "layer": layer, "path": path}.
    """
    cols = [(f.name, f.dataType.simpleString()) for f in df.schema.fields
            if f.name != "_geom"]
    if "_geom" not in df.columns:
        raise ValueError("df must carry a _geom column "
                         "(use encode_point_layer / encode_line_layer)")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    con = sqlite3.connect(path)
    try:
        _init_gpkg(con)
        attr_ddl = ", ".join(
            f'"{n}" {_SQL_TYPES.get(t, "TEXT")}' for n, t in cols)
        sep = ", " if attr_ddl else ""
        con.execute(
            f'CREATE TABLE IF NOT EXISTS "{layer}" '
            f"(fid INTEGER PRIMARY KEY AUTOINCREMENT, geom BLOB{sep}{attr_ddl})"
        )
        placeholders = ", ".join(["?"] * (1 + len(cols)))
        names = ", ".join(['geom'] + [f'"{n}"' for n, _ in cols])
        ins = f'INSERT INTO "{layer}" ({names}) VALUES ({placeholders})'

        n = 0
        env = [None, None, None, None]  # minx, miny, maxx, maxy
        batch: list[tuple] = []
        ordered = df.select("_geom", *[n_ for n_, _ in cols])
        for row in ordered.toLocalIterator(prefetchPartitions=True):
            blob = bytes(row["_geom"])
            minx, maxx, miny, maxy = struct.unpack_from("<4d", blob, 8)
            env[0] = minx if env[0] is None else min(env[0], minx)
            env[1] = miny if env[1] is None else min(env[1], miny)
            env[2] = maxx if env[2] is None else max(env[2], maxx)
            env[3] = maxy if env[3] is None else max(env[3], maxy)
            batch.append((blob, *[row[n_] for n_, _ in cols]))
            n += 1
            if len(batch) >= batch_rows:
                con.executemany(ins, batch)
                batch.clear()
        if batch:
            con.executemany(ins, batch)
        con.execute(
            "INSERT OR REPLACE INTO gpkg_contents (table_name, data_type, "
            "identifier, min_x, min_y, max_x, max_y, srs_id) "
            "VALUES (?, 'features', ?, ?, ?, ?, ?, ?)",
            (layer, layer, env[0], env[1], env[2], env[3], srs_id),
        )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_geometry_columns VALUES "
            "(?, 'geom', ?, ?, 0, 0)",
            (layer, geometry_type.upper(), srs_id),
        )
        con.commit()
    finally:
        con.close()
    return {"rows": n, "layer": layer, "path": path}


def read_geopackage(path: str, layer: str) -> list[dict]:
    """Round-trip reader: list of {attrs..., 'wkb_type', 'coords'} —
    test/verification surface, not a scan path."""
    con = sqlite3.connect(path)
    try:
        cur = con.execute(f'SELECT * FROM "{layer}"')
        names = [d[0] for d in cur.description]
        out = []
        for row in cur.fetchall():
            rec = dict(zip(names, row))
            gtype, coords = parse_gpkg_blob(rec.pop("geom"))
            rec["wkb_type"] = gtype
            rec["coords"] = coords
            out.append(rec)
        return out
    finally:
        con.close()
