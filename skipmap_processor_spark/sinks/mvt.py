"""Mapbox Vector Tile sink (SURVEY §2.1 S14) — hand-rolled protobuf wire
format, per-tile distributed encode.

The reference shells out to tippecanoe per layer and merges with
tile-join (/root/reference/src/transforms/TilesGenerator.ts:8-60) — an
external-process sink. Spark-first restatement: tiles are independent
units of work, so the engine (a) assigns every feature to its
(z, x, y) tile with pure JVM web-mercator math, (b) shuffles once on the
tile key, and (c) encodes each tile group into a spec-conformant MVT
(vector_tile.proto, protobuf wire format written byte-by-byte — varint +
length-delimited fields, zigzag command encoding) batched per shuffle
partition in one ``mapInPandas`` call. Output is a DataFrame (z, x, y, tile bytes) the caller
writes to parquet / object storage; no driver bottleneck, no external
binary.

Scope: point and linestring features, one layer per call, string/int
properties — the slice the reference pipeline actually emits. A decoder
(``decode_tile``) ships for round-trip tests.
"""

from __future__ import annotations

import math
import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MVT_VERSION = 2
DEFAULT_EXTENT = 4096

# --- protobuf wire-format primitives (vector_tile.proto is proto2) --------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


# --- geometry command encoding --------------------------------------------


def _encode_point_geom(px: int, py: int) -> list[int]:
    # MoveTo(1) count 1, then zigzag dx, dy
    return [(1 << 3) | 1, _zigzag(px), _zigzag(py)]


def _encode_line_geom(coords: list[tuple[int, int]]) -> list[int]:
    out = [(1 << 3) | 1, _zigzag(coords[0][0]), _zigzag(coords[0][1])]
    cx, cy = coords[0]
    segs = []
    for x, y in coords[1:]:
        segs += [_zigzag(x - cx), _zigzag(y - cy)]
        cx, cy = x, y
    out.append((len(coords[1:]) << 3) | 2)  # LineTo count
    out += segs
    return out


def _encode_value(v) -> bytes:
    """vector_tile.Tile.Value message."""
    if isinstance(v, bool):
        return _field(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _field(6, 0) + _varint(_zigzag(v))  # sint_value
    if isinstance(v, float):
        return _field(3, 1) + struct.pack("<d", v)  # double_value
    s = str(v).encode("utf-8")
    return _len_field(1, s)  # string_value


def encode_layer(name: str, features: list[dict],
                 extent: int = DEFAULT_EXTENT) -> bytes:
    """Encode one vector_tile.Tile.Layer.

    feature dict: {"geom_type": 1|2, "coords": [(px,py),...],
                   "props": {k: v}} with tile-local integer coordinates.
    Keys/values are interned layer-wide, per spec.
    """
    keys: dict[str, int] = {}
    vals: dict[tuple, int] = {}
    feat_msgs = []
    for ft in features:
        tags = []
        for k, v in ft.get("props", {}).items():
            if v is None:
                continue
            ki = keys.setdefault(k, len(keys))
            vk = (type(v).__name__, v)
            vi = vals.setdefault(vk, len(vals))
            tags += [ki, vi]
        if ft["geom_type"] == 1:
            geom = _encode_point_geom(*ft["coords"][0])
        else:
            geom = _encode_line_geom(ft["coords"])
        body = (_field(3, 0) + _varint(ft["geom_type"])
                + _len_field(2, b"".join(_varint(t) for t in tags))
                + _len_field(4, b"".join(_varint(g) for g in geom)))
        feat_msgs.append(_len_field(2, body))
    layer = (_field(15, 0) + _varint(MVT_VERSION)
             + _len_field(1, name.encode("utf-8"))
             + b"".join(feat_msgs)
             + b"".join(_len_field(3, k.encode("utf-8")) for k in keys)
             + b"".join(_len_field(4, _encode_value(v)) for (_t, v) in vals)
             + _field(5, 0) + _varint(extent))
    return layer


def encode_tile(layers: dict[str, list[dict]],
                extent: int = DEFAULT_EXTENT) -> bytes:
    return b"".join(_len_field(3, encode_layer(n, f, extent))
                    for n, f in layers.items())


def _encode_point_feats_np(px, py):
    """Vectorized feature messages for prop-less point features —
    byte-identical to the per-feature loop in :func:`encode_layer`
    (asserted in tests), built as one numpy scatter instead of ~10 Python
    object constructions per feature (guide S4.2: batch work in native
    code). Returns None when any coordinate needs a >2-byte varint (or is
    negative), signalling the caller to take the general loop."""
    import numpy as np

    px = np.asarray(px, dtype=np.int64)
    py = np.asarray(py, dtype=np.int64)
    if px.size == 0:
        return b""
    if (px.min() < 0 or py.min() < 0
            or px.max() >= 1 << 13 or py.max() >= 1 << 13):
        return None
    zx, zy = px << 1, py << 1  # zigzag of non-negative ints
    wx = np.where(zx >= 128, 2, 1)
    wy = np.where(zy >= 128, 2, 1)
    # feature msg: [0x12, body_len] body; body = [0x18 0x01] type
    #   + [0x12 0x00] empty tags + [0x22, geom_len] geom;
    # geom = [0x09] MoveTo(1) + varint(zx) + varint(zy)
    geom_len = 1 + wx + wy
    body_len = 6 + geom_len
    feat_len = 2 + body_len
    base = np.concatenate([[0], np.cumsum(feat_len)[:-1]])
    out = np.empty(int(feat_len.sum()), dtype=np.uint8)
    out[base] = 0x12
    out[base + 1] = body_len
    out[base + 2] = 0x18
    out[base + 3] = 0x01
    out[base + 4] = 0x12
    out[base + 5] = 0x00
    out[base + 6] = 0x22
    out[base + 7] = geom_len
    out[base + 8] = 0x09
    one, two = wx == 1, wx == 2
    out[base[one] + 9] = zx[one]
    out[base[two] + 9] = (zx[two] & 0x7F) | 0x80
    out[base[two] + 10] = zx[two] >> 7
    ybase = base + 9 + wx
    one, two = wy == 1, wy == 2
    out[ybase[one]] = zy[one]
    out[ybase[two]] = (zy[two] & 0x7F) | 0x80
    out[ybase[two] + 1] = zy[two] >> 7
    return out.tobytes()


def decode_tile(buf: bytes) -> dict[str, list[dict]]:
    """Round-trip decoder (tests): tile bytes -> {layer: [feature...]}."""
    layers: dict[str, list[dict]] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        assert tag == (3 << 3) | 2, f"unexpected tile field {tag}"
        ln, pos = _read_varint(buf, pos)
        name, feats = _decode_layer(buf[pos:pos + ln])
        layers[name] = feats
        pos += ln
    return layers


def _decode_layer(buf: bytes) -> tuple[str, list[dict]]:
    pos = 0
    name = ""
    keys: list[str] = []
    vals: list = []
    raw_feats: list[bytes] = []
    extent = DEFAULT_EXTENT
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            if num == 5:
                extent = v
        else:
            ln, pos = _read_varint(buf, pos)
            chunk = buf[pos:pos + ln]
            pos += ln
            if num == 1:
                name = chunk.decode("utf-8")
            elif num == 2:
                raw_feats.append(chunk)
            elif num == 3:
                keys.append(chunk.decode("utf-8"))
            elif num == 4:
                vals.append(_decode_value(chunk))
    feats = []
    for fb in raw_feats:
        ft = _decode_feature(fb, keys, vals)
        ft["extent"] = extent
        feats.append(ft)
    return name, feats


def _decode_value(buf: bytes):
    tag, pos = _read_varint(buf, 0)
    num, wire = tag >> 3, tag & 7
    if num == 1:
        ln, pos = _read_varint(buf, pos)
        return buf[pos:pos + ln].decode("utf-8")
    if num == 3:
        return struct.unpack_from("<d", buf, pos)[0]
    if num == 6:
        v, _ = _read_varint(buf, pos)
        return _unzigzag(v)
    if num == 7:
        v, _ = _read_varint(buf, pos)
        return bool(v)
    raise ValueError(f"unsupported value field {num}")


def _decode_feature(buf: bytes, keys: list[str], vals: list) -> dict:
    pos = 0
    out = {"geom_type": 0, "coords": [], "props": {}}
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            if num == 3:
                out["geom_type"] = v
            continue
        ln, pos = _read_varint(buf, pos)
        chunk = buf[pos:pos + ln]
        pos += ln
        if num == 2:
            tpos = 0
            while tpos < len(chunk):
                ki, tpos = _read_varint(chunk, tpos)
                vi, tpos = _read_varint(chunk, tpos)
                out["props"][keys[ki]] = vals[vi]
        elif num == 4:
            ints = []
            gpos = 0
            while gpos < len(chunk):
                v, gpos = _read_varint(chunk, gpos)
                ints.append(v)
            out["coords"] = _decode_geom(ints)
    return out


def _decode_geom(ints: list[int]) -> list[tuple[int, int]]:
    coords: list[tuple[int, int]] = []
    cx = cy = 0
    i = 0
    while i < len(ints):
        cmd, count = ints[i] & 7, ints[i] >> 3
        i += 1
        if cmd in (1, 2):  # MoveTo / LineTo
            for _ in range(count):
                cx += _unzigzag(ints[i])
                cy += _unzigzag(ints[i + 1])
                coords.append((cx, cy))
                i += 2
        else:  # ClosePath
            pass
    return coords


# --- Spark-side tiling ------------------------------------------------------


def tile_coords_expr(lon, lat, zoom: int, extent: int = DEFAULT_EXTENT):
    """(tile_x, tile_y, pixel_x, pixel_y) as JVM columns — standard web
    mercator tiling (the reference's sinusoidal/tile math precedent:
    /root/reference/src/utils/VIIRSPixelExtractor.ts:48-102). Pure
    built-ins: stays in codegen, the shuffle key is computed map-side."""
    n = float(2 ** zoom)
    x_norm = (lon + F.lit(180.0)) / F.lit(360.0)
    lat_r = F.radians(lat)
    y_norm = (F.lit(1.0)
              - F.log(F.tan(lat_r) + F.lit(1.0) / F.cos(lat_r))
              / F.lit(math.pi)) / F.lit(2.0)
    gx = x_norm * F.lit(n * extent)
    gy = y_norm * F.lit(n * extent)
    tx = F.floor(gx / F.lit(extent)).cast("int")
    ty = F.floor(gy / F.lit(extent)).cast("int")
    px = (gx - tx.cast("double") * F.lit(float(extent))).cast("int")
    py = (gy - ty.cast("double") * F.lit(float(extent))).cast("int")
    return tx, ty, px, py


def write_point_tiles(df: DataFrame, zoom: int, layer: str = "features",
                      lon_col: str = "lon", lat_col: str = "lat",
                      prop_cols: list[str] | None = None,
                      extent: int = DEFAULT_EXTENT) -> DataFrame:
    """Point features -> one MVT blob per (z, x, y) tile.

    One shuffle (repartition on the tile key), per-tile encode batched
    per partition in mapInPandas; returns DataFrame(z int, x int, y int, tile binary, n_features long).
    Latitudes beyond web-mercator's +/-85.05 deg are dropped, per spec.
    """
    props = prop_cols or []
    tx, ty, px, py = tile_coords_expr(F.col(lon_col), F.col(lat_col),
                                      zoom, extent)
    staged = (
        df.filter((F.col(lat_col) > -85.05112878)
                  & (F.col(lat_col) < 85.05112878))
        .select(tx.alias("x"), ty.alias("y"), px.alias("px"),
                py.alias("py"), *props)
    )

    def _encode_tile_group(x: int, y: int, pdf: pd.DataFrame) -> dict:
        # deterministic feature order -> byte-stable tiles (incremental
        # re-encodes must reproduce a full build exactly)
        pdf = pdf.sort_values(["px", "py", *props], kind="stable")
        blob = None
        if not props:
            # prop-less points: vectorized feature assembly, byte-equal
            # to the loop below (None -> coords need the general path)
            feats_np = _encode_point_feats_np(
                pdf["px"].to_numpy(), pdf["py"].to_numpy())
            if feats_np is not None:
                lyr = (_field(15, 0) + _varint(MVT_VERSION)
                       + _len_field(1, layer.encode("utf-8"))
                       + feats_np
                       + _field(5, 0) + _varint(extent))
                blob = _len_field(3, lyr)
        if blob is None:
            feats = [
                {
                    "geom_type": 1,
                    "coords": [(int(r.px), int(r.py))],
                    "props": {c: getattr(r, c) for c in props},
                }
                for r in pdf.itertuples()
            ]
            blob = encode_tile({layer: feats}, extent)
        return {"z": zoom, "x": x, "y": y, "tile": blob,
                "n_features": len(pdf)}

    # partition-level encode: groupBy().applyInPandas pays one Python
    # call + Arrow round-trip PER TILE (thousands of one-tile frames);
    # repartition on the tile key keeps the tile-locality guarantee and
    # batches every tile of a partition through one call. Per-tile bytes
    # are unchanged — the group encoder above is the same code.
    def _encode_partition(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = (pd.concat(pdfs, ignore_index=True)
               if len(pdfs) > 1 else pdfs[0])
        rows = [
            _encode_tile_group(int(x), int(y), g)
            for (x, y), g in pdf.groupby(["x", "y"], sort=False,
                                         dropna=False)
        ]
        yield pd.DataFrame(rows)

    return staged.repartition("x", "y").mapInPandas(
        _encode_partition, "z int, x int, y int, tile binary, n_features long")


# --- incremental re-tiling ---------------------------------------------------


def changed_tile_keys(changes: DataFrame, zoom: int,
                      lon_col: str = "lon", lat_col: str = "lat",
                      extent: int = DEFAULT_EXTENT) -> list[tuple[int, int]]:
    """Distinct (x, y) tile keys touched by a change-feed frame
    (``changefeed.table_changes`` output carrying lon/lat payload columns):
    a moved feature dirties BOTH its pre-image and post-image tile, an
    insert/delete dirties one. The distinct list is bounded by the number
    of changed rows (<< tile count), so the driver-side collect is the
    same bounded pattern as LakeTable.lookup's bucket list."""
    tx, ty, _px, _py = tile_coords_expr(F.col(lon_col), F.col(lat_col),
                                        zoom, extent)
    rows = (
        changes.filter(F.col(lon_col).isNotNull()
                       & (F.col(lat_col) > -85.05112878)
                       & (F.col(lat_col) < 85.05112878))
        .select(tx.alias("x"), ty.alias("y"))
        .distinct()
        .collect()
    )
    return sorted((r["x"], r["y"]) for r in rows)


def retile(points: DataFrame, zoom: int,
           changed: list[tuple[int, int]] | None = None,
           layer: str = "features", lon_col: str = "lon",
           lat_col: str = "lat", prop_cols: list[str] | None = None,
           extent: int = DEFAULT_EXTENT) -> DataFrame:
    """Re-encode tiles from the CURRENT point set — only the ``changed``
    tile keys when given (incremental maintenance: changefeed ->
    changed_tile_keys -> retile), every tile when None (full build).

    The reference regenerates the whole tileset through tippecanoe on
    every run (TilesGenerator.ts:8-60); here a trickle of changes
    re-encodes O(changed tiles), not O(all tiles). The tile-key filter is
    applied BEFORE the shuffle, so when ``points`` is stored partitioned/
    bucketed by tile key the scan prunes to the changed tiles; deleted-to-
    empty tiles simply emit no row (consumers drop the key, mirroring the
    lake's tombstone contract)."""
    if changed is None:
        return write_point_tiles(points, zoom, layer=layer, lon_col=lon_col,
                                 lat_col=lat_col, prop_cols=prop_cols,
                                 extent=extent)
    if not changed:
        return write_point_tiles(points, zoom, layer=layer, lon_col=lon_col,
                                 lat_col=lat_col, prop_cols=prop_cols,
                                 extent=extent).limit(0)
    tx, ty, _px, _py = tile_coords_expr(F.col(lon_col), F.col(lat_col),
                                        zoom, extent)
    key = tx.cast("bigint") * F.lit(1 << 32) + ty.cast("bigint")
    wanted = [int(x) * (1 << 32) + int(y) for x, y in changed]
    pruned = points.filter(key.isin(wanted))
    return write_point_tiles(pruned, zoom, layer=layer, lon_col=lon_col,
                             lat_col=lat_col, prop_cols=prop_cols,
                             extent=extent)
