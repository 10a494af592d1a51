"""Geometry operators (operators/geo.py): F9 points-along-line, W4 arc
merge, A8 dissolve — unit semantics against hand-computed expectations and
a pure-Python twin of the reference's order-dependent oneway fold."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from skipmap_processor_spark.operators import geo


def _hav_py(lon1, lat1, lon2, lat2):
    r = math.radians
    a = (math.sin((r(lat2) - r(lat1)) / 2) ** 2
         + math.cos(r(lat1)) * math.cos(r(lat2))
         * math.sin((r(lon2) - r(lon1)) / 2) ** 2)
    return 2 * geo.EARTH_RADIUS_KM * math.asin(math.sqrt(a))


# --------------------------------------------------------------- F9


def test_points_along_line_single_segment(spark):
    # equator segment 0E..2E ~ 222.4 km; interval 100 km -> start, 2
    # interior points, end
    pts = spark.createDataFrame(
        [(1, 0, 0.0, 0.0), (1, 1, 2.0, 0.0)],
        "line_id int, idx int, lon double, lat double",
    )
    out = geo.points_along_line(pts, interval_km=100.0).collect()
    lons = sorted(r["lon"] for r in out)
    seg = _hav_py(0, 0, 2, 0)
    assert len(out) == 4
    assert lons[0] == 0.0 and lons[-1] == 2.0
    # interior points at 100 and 200 km, lerped linearly
    assert lons[1] == pytest.approx(2.0 * 100.0 / seg, abs=1e-6)
    assert lons[2] == pytest.approx(2.0 * 200.0 / seg, abs=1e-6)


def test_points_along_line_start_end_always_present(spark):
    # line shorter than the interval -> exactly its two endpoints
    pts = spark.createDataFrame(
        [(7, 0, 10.0, 10.0), (7, 1, 10.1, 10.1)],
        "line_id int, idx int, lon double, lat double",
    )
    out = geo.points_along_line(pts, interval_km=500.0).collect()
    assert sorted((r["lon"], r["lat"]) for r in out) == [
        (10.0, 10.0), (10.1, 10.1)]


def test_points_along_line_dedupes_and_skips_zero_segments(spark):
    # duplicate consecutive vertex (zero-length segment) must not divide
    # by zero or duplicate the output position
    pts = spark.createDataFrame(
        [(3, 0, 0.0, 0.0), (3, 1, 0.0, 0.0), (3, 2, 1.0, 0.0)],
        "line_id int, idx int, lon double, lat double",
    )
    out = geo.points_along_line(pts, interval_km=60.0).collect()
    positions = [(r["lon"], r["lat"]) for r in out]
    assert len(positions) == len(set(positions))
    assert (0.0, 0.0) in positions and (1.0, 0.0) in positions
    # 111.2 km line, one interior point at 60 km
    assert len(out) == 3


def test_points_along_line_crosses_vertices(spark):
    # cumulative distance spans segments: a 3-vertex line where the
    # second interval point lands in the second segment
    pts = spark.createDataFrame(
        [(9, 0, 0.0, 0.0), (9, 1, 1.0, 0.0), (9, 2, 3.0, 0.0)],
        "line_id int, idx int, lon double, lat double",
    )
    seg1 = _hav_py(0, 0, 1, 0)
    # interval 1.2*seg1: points at 1.2*seg1 and 2.4*seg1, both inside the
    # second (2-degree) segment -> lon 1.2 and 2.4 (equatorial distance is
    # linear in longitude, so the lerp is exact)
    out = geo.points_along_line(pts, interval_km=seg1 * 1.2).collect()
    lons = sorted(r["lon"] for r in out)
    assert lons == [0.0, pytest.approx(1.2, abs=1e-6),
                    pytest.approx(2.4, abs=1e-6), 3.0]


# --------------------------------------------------------------- W4


def _reference_oneway_fold(runs: list[tuple[bool, bool | None]]):
    """Literal transcription of MergeOverlappingRuns.ts getDirectionData
    (order-dependent reduce) — the ground truth the set-based Spark
    aggregation must match for every input ordering."""
    cur = {"isReversed": runs[0][0], "oneway": runs[0][1]}
    for is_rev, ow in runs[1:]:
        nxt = {"isReversed": is_rev, "oneway": ow}
        if (cur["oneway"] is True and nxt["oneway"] is True
                and cur["isReversed"] != nxt["isReversed"]):
            cur = {"oneway": False, "isReversed": cur["isReversed"]}
        elif cur["oneway"] is False:
            cur = {"oneway": False, "isReversed": nxt["isReversed"]}
        elif nxt["oneway"] is False:
            cur = {"oneway": False, "isReversed": cur["isReversed"]}
        elif cur["oneway"] is True:
            pass
        elif nxt["oneway"] is True:
            cur = nxt
    return cur["oneway"]


@pytest.mark.parametrize("runs,expected", [
    ([(False, True), (True, True)], False),      # opposite oneways clash
    ([(False, True), (False, True)], True),      # same direction stays one-way
    ([(False, None), (False, True)], True),
    ([(False, False), (False, True)], False),    # declared false wins
    ([(False, None), (True, None)], None),
    ([(False, True), (False, None), (True, True)], False),
])
def test_arc_merge_oneway_matches_reference_fold(spark, runs, expected):
    import itertools

    # the set-based formula must equal the reference fold for EVERY
    # permutation (the reference iterates in file order; ours must be
    # order-independent AND agree)
    for perm in itertools.permutations(runs):
        assert _reference_oneway_fold(list(perm)) == expected
    df = spark.createDataFrame(
        [(1, rev, ow, "n", 1.0) for rev, ow in runs],
        "arc_id int, is_reversed boolean, oneway boolean, "
        "name string, value double",
    )
    got = geo.merge_overlapping_arcs(df).collect()[0]
    assert got["oneway_merged"] == expected
    assert got["n_runs"] == len(runs)


def test_arc_merge_properties(spark):
    df = spark.createDataFrame(
        [(5, False, True, "b", 2.0), (5, False, True, "a", 3.5),
         (5, False, True, "a", 1.0)],
        "arc_id int, is_reversed boolean, oneway boolean, "
        "name string, value double",
    )
    got = geo.merge_overlapping_arcs(df).collect()[0]
    assert got["names"] == "a, b"
    assert got["max_value"] == 3.5


# --------------------------------------------------------------- A8


def test_dissolve_chain_and_isolated(spark):
    # A(0..10) overlaps B(8..20) overlaps C(18..30); D is isolated.
    boxes = spark.createDataFrame(
        [(1, 0, 0, 10, 10), (2, 8, 0, 20, 10), (3, 18, 0, 30, 10),
         (4, 100, 100, 105, 105)],
        "id bigint, x1 bigint, y1 bigint, x2 bigint, y2 bigint",
    )
    out = {r["comp"]: r for r in geo.dissolve_boxes(boxes).collect()}
    assert set(out) == {1, 4}
    assert out[1]["n_boxes"] == 3
    assert (out[1]["x1"], out[1]["x2"]) == (0, 30)
    assert out[4]["n_boxes"] == 1


def test_dissolve_touching_edges_merge(spark):
    # closed-interval overlap: boxes sharing only an edge dissolve
    boxes = spark.createDataFrame(
        [(1, 0, 0, 10, 10), (2, 10, 0, 20, 10)],
        "id bigint, x1 bigint, y1 bigint, x2 bigint, y2 bigint",
    )
    out = geo.dissolve_boxes(boxes).collect()
    assert len(out) == 1 and out[0]["n_boxes"] == 2


def test_dissolve_cross_cell_components(spark):
    # a long box spanning several grid cells must not duplicate pairs or
    # split the component
    boxes = spark.createDataFrame(
        [(1, 0, 0, 95, 5), (2, 90, 0, 120, 5), (3, 200, 200, 205, 205)],
        "id bigint, x1 bigint, y1 bigint, x2 bigint, y2 bigint",
    )
    out = {r["comp"]: r["n_boxes"]
           for r in geo.dissolve_boxes(boxes, cell_size=20).collect()}
    assert out == {1: 2, 3: 1}


def test_components_long_distributed_path(spark):
    # force the iterative pointer-jumping path (driver threshold 0) on a
    # 12-node chain plus an isolated vertex; min label must propagate to
    # every member in O(log L) rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(2, 13)], "a bigint, b bigint")
    verts = spark.createDataFrame(
        [(i,) for i in range(2, 14)] + [(99,)], "id bigint")
    labels = geo._components_long(edges, verts, max_edges_on_driver=0)
    got = {r["id"]: r["comp"] for r in labels.collect()}
    assert all(got[i] == 2 for i in range(2, 14))
    assert got[99] == 99
