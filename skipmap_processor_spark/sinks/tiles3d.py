"""3D Tiles sink (SURVEY §2.1 S15) — .pnts point-cloud tiles + tileset.json.

The reference's Tiles3DGenerator (/root/reference/src/transforms/
Tiles3DGenerator.ts:84+) emits a 3D Tiles tileset for elevation-aware
visualization. Spark-first restatement over the same split as the MVT
sink: features are assigned to spatial tiles with JVM column math, one
shuffle on the tile key, and each tile group is encoded into a
spec-conformant Point Cloud tile (3D Tiles 1.0 `.pnts`: 28-byte header,
8-byte-aligned feature-table JSON, float32 POSITION buffer) batched
per shuffle partition in one ``mapInPandas`` call. ``tileset_json`` assembles the root tileset from the
tile DataFrame's bounding volumes — a bounded driver-side step over tile
METADATA (one row per tile), never over features.

Positions are emitted in a local east-north-up-ish planar frame
(degrees scaled to meters at the equator, elevation passthrough) —
enough for a geometric round-trip; a production deployment would swap
the frame transform, not the pipeline.
"""

from __future__ import annotations

import json
import struct

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PNTS_VERSION = 1
_DEG_M = 111_319.490793  # meters per degree at the equator


def encode_pnts(positions) -> bytes:
    """Encode one .pnts tile: header + featureTableJSON + float32 buffer.

    ``positions``: list of (x, y, z) or an (n, 3) numpy array — the array
    path serializes the whole position buffer with one vectorized
    ``tobytes`` (the sink encodes millions of points per tile group)."""
    import numpy as np

    arr = np.asarray(positions, dtype="<f4").reshape(-1, 3)
    n = arr.shape[0]
    ft_json = json.dumps({
        "POINTS_LENGTH": n,
        "POSITION": {"byteOffset": 0},
    }, separators=(",", ":")).encode("utf-8")
    # feature table JSON must end on an 8-byte boundary (spec 10.2)
    pad = (8 - (28 + len(ft_json)) % 8) % 8
    ft_json += b" " * pad
    body = arr.tobytes()
    pad2 = (8 - len(body) % 8) % 8
    body += b"\x00" * pad2
    total = 28 + len(ft_json) + len(body)
    header = struct.pack("<4sIIIIII", b"pnts", PNTS_VERSION, total,
                         len(ft_json), len(body), 0, 0)
    return header + ft_json + body


def decode_pnts(blob: bytes) -> list[tuple[float, float, float]]:
    """Round-trip decoder for tests."""
    magic, version, total, ftj_len, ftb_len, btj_len, btb_len = \
        struct.unpack_from("<4sIIIIII", blob, 0)
    if magic != b"pnts" or version != PNTS_VERSION:
        raise ValueError("not a pnts tile")
    ft = json.loads(blob[28:28 + ftj_len].decode("utf-8"))
    n = ft["POINTS_LENGTH"]
    off = 28 + ftj_len + ft["POSITION"]["byteOffset"]
    return [struct.unpack_from("<3f", blob, off + 12 * i) for i in range(n)]


def write_pnts_tiles(df: DataFrame, cell_deg: float = 1.0,
                     lon_col: str = "lon", lat_col: str = "lat",
                     elev_col: str | None = None) -> DataFrame:
    """Points -> one .pnts blob per (tx, ty) cell of ``cell_deg`` degrees.

    Returns DataFrame(tx int, ty int, n_points long, min_lon..max_lat
    double, tile binary). One shuffle; encode runs where the points live.
    """
    lon, lat = F.col(lon_col), F.col(lat_col)
    elev = F.col(elev_col) if elev_col else F.lit(0.0)
    staged = df.select(
        F.floor(lon / F.lit(cell_deg)).cast("int").alias("tx"),
        F.floor(lat / F.lit(cell_deg)).cast("int").alias("ty"),
        lon.alias("_lon"), lat.alias("_lat"),
        elev.cast("double").alias("_elev"),
    )

    # partition-level encode: groupBy().applyInPandas pays one Python
    # call + Arrow round-trip PER TILE (~1800 one-tile frames at every
    # sf — measured 4.1 s of pure per-group overhead at sf0.1 against
    # 0.5 s for the identical math batched per partition). repartition
    # on the tile key gives the same tile-locality guarantee the
    # grouped API provided; the per-tile math is unchanged.
    def _encode_partition(batches):
        import numpy as np

        pdfs = list(batches)
        if not pdfs:
            return
        pdf = (pd.concat(pdfs, ignore_index=True)
               if len(pdfs) > 1 else pdfs[0])
        rows = []
        # dropna=False: a null tile key fails int() exactly as the
        # one-group-per-call encoder did — same contract, not dropped
        for (tx, ty), g in pdf.groupby(["tx", "ty"], sort=False,
                                       dropna=False):
            tx, ty = int(tx), int(ty)
            # tile-local planar frame anchored at the cell origin; fully
            # vectorized — one numpy expression per axis, no per-point
            # loop
            ox, oy = tx * cell_deg, ty * cell_deg
            pos = np.column_stack([
                (g["_lon"].to_numpy() - ox) * _DEG_M,
                (g["_lat"].to_numpy() - oy) * _DEG_M,
                g["_elev"].to_numpy(),
            ])
            rows.append({
                "tx": tx, "ty": ty, "n_points": len(pos),
                "min_lon": float(g["_lon"].min()),
                "min_lat": float(g["_lat"].min()),
                "max_lon": float(g["_lon"].max()),
                "max_lat": float(g["_lat"].max()),
                "tile": encode_pnts(pos),
            })
        yield pd.DataFrame(rows)

    return staged.repartition("tx", "ty").mapInPandas(
        _encode_partition,
        "tx int, ty int, n_points long, min_lon double, min_lat double, "
        "max_lon double, max_lat double, tile binary")


def tileset_json(tiles_meta: list[dict], cell_deg: float = 1.0,
                 uri_pattern: str = "{tx}_{ty}.pnts") -> dict:
    """Root tileset.json from per-tile metadata rows (tx, ty, min/max
    lon/lat, n_points) — bounded driver-side assembly over tile METADATA.
    Region bounding volumes are [west, south, east, north, minh, maxh]
    in radians per spec."""
    import math

    def region(t):
        return [
            math.radians(t["min_lon"]), math.radians(t["min_lat"]),
            math.radians(t["max_lon"]), math.radians(t["max_lat"]),
            0.0, 0.0,
        ]

    if tiles_meta:
        root_region = [
            min(region(t)[0] for t in tiles_meta),
            min(region(t)[1] for t in tiles_meta),
            max(region(t)[2] for t in tiles_meta),
            max(region(t)[3] for t in tiles_meta),
            0.0, 0.0,
        ]
    else:
        root_region = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    return {
        "asset": {"version": "1.0"},
        "geometricError": cell_deg * _DEG_M,
        "root": {
            "boundingVolume": {"region": root_region},
            "geometricError": cell_deg * _DEG_M / 8.0,
            "refine": "ADD",
            "children": [
                {
                    "boundingVolume": {"region": region(t)},
                    "geometricError": 0.0,
                    "content": {
                        "uri": uri_pattern.format(tx=t["tx"], ty=t["ty"])
                    },
                }
                for t in tiles_meta
            ],
        },
    }
