"""Geo sinks (sinks/): GeoPackage file validity + round-trip, MVT
protobuf round-trip + tiling math, 3D Tiles pnts round-trip + tileset."""

from __future__ import annotations

import json
import math
import sqlite3

from pyspark.sql import functions as F

from skipmap_processor_spark.sinks import geopackage as gpkg
from skipmap_processor_spark.sinks import mvt, tiles3d


# ----------------------------------------------------------- GeoPackage


def test_gpkg_point_layer_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out.gpkg")
    df = spark.createDataFrame(
        [(1, "a", 10.5, -3.25), (2, "b", -120.0, 45.0), (3, None, 0.0, 0.0)],
        "fid_src bigint, tag string, lon double, lat double",
    )
    res = gpkg.write_geopackage(
        gpkg.encode_point_layer(df), path, "peaks", "POINT")
    assert res["rows"] == 3

    rows = gpkg.read_geopackage(path, "peaks")
    assert len(rows) == 3
    by_src = {r["fid_src"]: r for r in rows}
    assert by_src[1]["wkb_type"] == 1
    assert by_src[1]["coords"] == [(10.5, -3.25)]
    assert by_src[3]["tag"] is None


def test_gpkg_file_conformance(spark, tmp_path):
    path = str(tmp_path / "conf.gpkg")
    df = spark.createDataFrame([(1.0, 2.0)], "lon double, lat double")
    gpkg.write_geopackage(gpkg.encode_point_layer(df), path, "pts")

    con = sqlite3.connect(path)
    try:
        (app_id,) = con.execute("PRAGMA application_id").fetchone()
        assert app_id == gpkg.GPKG_APPLICATION_ID  # 'GPKG'
        srs = dict(con.execute(
            "SELECT srs_id, organization FROM gpkg_spatial_ref_sys"
        ).fetchall())
        assert srs[4326] == "EPSG" and -1 in srs and 0 in srs
        contents = con.execute(
            "SELECT table_name, data_type, min_x, max_y, srs_id "
            "FROM gpkg_contents").fetchall()
        assert contents == [("pts", "features", 1.0, 2.0, 4326)]
        geom_cols = con.execute(
            "SELECT table_name, column_name, geometry_type_name "
            "FROM gpkg_geometry_columns").fetchall()
        assert geom_cols == [("pts", "geom", "POINT")]
    finally:
        con.close()


def test_gpkg_line_layer_and_multi_layer(spark, tmp_path):
    path = str(tmp_path / "multi.gpkg")
    pts = spark.createDataFrame([(5.0, 6.0)], "lon double, lat double")
    gpkg.write_geopackage(gpkg.encode_point_layer(pts), path, "pts")

    lines = spark.createDataFrame(
        [(7, [(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)])],
        "run_id bigint, coords array<struct<lon:double,lat:double>>",
    )
    res = gpkg.write_geopackage(
        gpkg.encode_line_layer(lines), path, "runs", "LINESTRING")
    assert res["rows"] == 1

    rows = gpkg.read_geopackage(path, "runs")
    assert rows[0]["wkb_type"] == 2
    assert rows[0]["coords"] == [(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)]
    # first layer untouched, both registered in gpkg_contents
    assert len(gpkg.read_geopackage(path, "pts")) == 1
    con = sqlite3.connect(path)
    try:
        n = con.execute("SELECT COUNT(*) FROM gpkg_contents").fetchone()[0]
        assert n == 2
    finally:
        con.close()


def test_gpkg_blob_envelope_matches_wkb():
    blob = gpkg.gpkg_blob(gpkg.wkb_point(3.5, -1.5), (3.5, 3.5, -1.5, -1.5))
    gtype, coords = gpkg.parse_gpkg_blob(blob)
    assert (gtype, coords) == (1, [(3.5, -1.5)])


# ----------------------------------------------------------------- MVT


def test_mvt_layer_roundtrip_points_and_lines():
    feats = [
        {"geom_type": 1, "coords": [(100, 200)],
         "props": {"name": "a", "elev": 1234, "open": True, "w": 2.5}},
        {"geom_type": 2, "coords": [(0, 0), (10, 5), (8, 20)],
         "props": {"name": "b"}},
    ]
    tile = mvt.encode_tile({"features": feats})
    out = mvt.decode_tile(tile)
    assert list(out) == ["features"]
    got = out["features"]
    assert got[0]["geom_type"] == 1
    assert got[0]["coords"] == [(100, 200)]
    assert got[0]["props"] == {"name": "a", "elev": 1234, "open": True,
                               "w": 2.5}
    assert got[1]["coords"] == [(0, 0), (10, 5), (8, 20)]
    assert got[0]["extent"] == mvt.DEFAULT_EXTENT


def test_mvt_value_interning_dedupes():
    feats = [{"geom_type": 1, "coords": [(i, i)], "props": {"k": "same"}}
             for i in range(50)]
    one = mvt.encode_layer("l", feats[:1])
    many = mvt.encode_layer("l", feats)
    # 49 more features must not re-encode the shared key/value strings:
    # growth per feature is the feature message only (< 20 bytes here)
    assert len(many) - len(one) < 49 * 20


def test_mvt_zigzag_negative_deltas():
    feats = [{"geom_type": 2, "coords": [(500, 500), (400, 450), (0, 0)],
              "props": {}}]
    out = mvt.decode_tile(mvt.encode_tile({"l": feats}))
    assert out["l"][0]["coords"] == [(500, 500), (400, 450), (0, 0)]


def test_write_point_tiles_distributed(spark):
    df = spark.createDataFrame(
        [(0.01, 0.01, "a"), (0.02, 0.02, "b"),   # same tile at z=10
         (-100.0, 40.0, "c"),                     # different tile
         (5.0, 89.0, "polar-dropped")],
        "lon double, lat double, name string",
    )
    tiles = mvt.write_point_tiles(df, zoom=10, prop_cols=["name"]).collect()
    assert len(tiles) == 2
    by_n = {t["n_features"]: t for t in tiles}
    assert set(by_n) == {1, 2}
    two = by_n[2]
    decoded = mvt.decode_tile(bytes(two["tile"]))["features"]
    assert sorted(f["props"]["name"] for f in decoded) == ["a", "b"]
    # tile coordinates must match the standard web-mercator formula
    for f, lon, lat in ((by_n[1], -100.0, 40.0),):
        n = 2 ** 10
        assert f["x"] == int((lon + 180.0) / 360.0 * n)
        lr = math.radians(lat)
        assert f["y"] == int(
            (1 - math.log(math.tan(lr) + 1 / math.cos(lr)) / math.pi)
            / 2 * n)


# ------------------------------------------------------------- 3D Tiles


def test_pnts_roundtrip_and_alignment():
    pos = [(1.5, 2.5, 3.5), (-4.0, 0.0, 10.25)]
    blob = tiles3d.encode_pnts(pos)
    assert blob[:4] == b"pnts"
    # feature table JSON must end on an 8-byte boundary (spec 10.2)
    import struct
    ftj_len = struct.unpack_from("<I", blob, 12)[0]
    assert (28 + ftj_len) % 8 == 0
    assert struct.unpack_from("<I", blob, 8)[0] == len(blob)
    got = tiles3d.decode_pnts(blob)
    assert got == [tuple(map(float, p)) for p in pos]


def test_write_pnts_tiles_and_tileset(spark):
    df = spark.createDataFrame(
        [(0.25, 0.25, 100.0), (0.75, 0.75, 200.0), (5.5, 5.5, 300.0)],
        "lon double, lat double, elev double",
    )
    tiles = tiles3d.write_pnts_tiles(df, cell_deg=1.0,
                                     elev_col="elev").collect()
    assert len(tiles) == 2
    big = next(t for t in tiles if t["n_points"] == 2)
    pts = tiles3d.decode_pnts(bytes(big["tile"]))
    # tile-local ENU-ish meters; elevations pass through as z
    assert sorted(round(p[2]) for p in pts) == [100, 200]
    assert all(0 <= p[0] <= tiles3d._DEG_M for p in pts)

    meta = [t.asDict() for t in tiles]
    ts = tiles3d.tileset_json(meta, cell_deg=1.0)
    assert ts["asset"]["version"] == "1.0"
    assert len(ts["root"]["children"]) == 2
    child = ts["root"]["children"][0]
    w, s, e, n = child["boundingVolume"]["region"][:4]
    assert w <= e and s <= n
    json.dumps(ts)  # serializable


def test_mvt_vectorized_point_encode_byte_equal():
    """The numpy fast path for prop-less point features must be
    byte-identical to the per-feature loop encoder, across varint width
    boundaries (127/128) and the extent corners; out-of-range coords must
    decline (None) so the caller falls back to the loop."""
    import random

    random.seed(7)
    cases = [(0, 0), (63, 63), (64, 63), (127, 128), (128, 127),
             (4095, 4095), (1, 4095)]
    cases += [(random.randrange(4096), random.randrange(4096))
              for _ in range(500)]
    cases.sort()
    px = [c[0] for c in cases]
    py = [c[1] for c in cases]
    fast = mvt._encode_point_feats_np(px, py)
    feats = [{"geom_type": 1, "coords": [(a, b)], "props": {}}
             for a, b in cases]
    loop_layer = mvt.encode_layer("features", feats)
    fast_layer = (mvt._field(15, 0) + mvt._varint(mvt.MVT_VERSION)
                  + mvt._len_field(1, b"features")
                  + fast
                  + mvt._field(5, 0) + mvt._varint(mvt.DEFAULT_EXTENT))
    assert fast_layer == loop_layer
    # full-tile equality through the public entry points
    assert (mvt._len_field(3, fast_layer)
            == mvt.encode_tile({"features": feats}))
    # decline out-of-range rather than mis-encode
    assert mvt._encode_point_feats_np([1 << 13], [0]) is None
    assert mvt._encode_point_feats_np([-1], [0]) is None
    assert mvt._encode_point_feats_np([], []) == b""
