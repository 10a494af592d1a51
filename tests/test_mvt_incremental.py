"""Incremental re-tiling: change feed -> dirty tile keys -> retile only
those. Patching the previous tileset with the incrementally re-encoded
tiles must reproduce a from-scratch rebuild byte-for-byte (the encoder is
deterministic), while touching O(changed tiles) instead of O(all tiles).
The reference regenerates everything through tippecanoe per run
(TilesGenerator.ts:8-60); this is the 100 TB replacement."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from skipmap_processor_spark.changefeed import table_changes
from skipmap_processor_spark.lake import LakeTable
from skipmap_processor_spark.sinks import mvt

ZOOM = 6


def _mk_actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, "
        "op string, lang string, content string, content_sha string",
    )


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 48


def _with_coords(df):
    """Deterministic feature position derived from the payload — an
    update that changes `content` MOVES the feature, dirtying both its
    pre- and post-image tiles."""
    h = F.abs(F.xxhash64("repo", "path"))
    dl = F.length("content").cast("double")
    return df.withColumn(
        "lon", ((h % 320).cast("double") - 160.0 + dl / 1000.0)
    ).withColumn(
        "lat", (((h % 140).cast("double")) - 70.0 + dl / 2000.0)
    )


def _tiles(df) -> dict[tuple[int, int], bytes]:
    return {(r["x"], r["y"]): bytes(r["tile"]) for r in df.collect()}


def test_incremental_retile_patches_to_full_rebuild(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "tiles"),
                         num_buckets=4, merge_mode="mor")
    base = [(f"r{i % 7}", f"f{i}.py", c(i), i, "upsert", "py", "x" * (i % 90))
            for i in range(120)]
    t.merge_batch(_mk_actions(spark, [r + (None,) for r in base]), epoch=1)
    v1 = t._latest_version()

    # epoch 2: move two features (content change), add one, delete one
    changes = [
        ("r1", "f8.py", c(1000), 1000, "upsert", "py", "y" * 80, None),
        ("r2", "f9.py", c(1001), 1001, "upsert", "py", "z" * 33, None),
        ("r0", "brand.py", c(1002), 1002, "upsert", "py", "new", None),
        ("r3", "f10.py", c(1003), 1003, "delete", "py", None, None),
    ]
    t.merge_batch(_mk_actions(spark, changes), epoch=2)
    v2 = t._latest_version()

    pts_v1 = _with_coords(t.read(version=v1))
    pts_v2 = _with_coords(t.read(version=v2))

    feed = _with_coords(
        table_changes(t, v1, v2).filter(F.col("content").isNotNull()))
    dirty = mvt.changed_tile_keys(feed, ZOOM)
    assert dirty, "the four changes must dirty at least one tile"

    before = _tiles(mvt.retile(pts_v1, ZOOM, prop_cols=["path"]))
    after_full = _tiles(mvt.retile(pts_v2, ZOOM, prop_cols=["path"]))
    incr = _tiles(mvt.retile(pts_v2, ZOOM, changed=dirty,
                             prop_cols=["path"]))

    # incremental work is bounded by the dirty keys, a strict subset
    assert set(incr) <= set(dirty)
    assert len(dirty) < len(after_full)

    # patch semantics: drop dirty keys from the old set, overlay the
    # re-encoded ones -> byte-identical to the full rebuild
    patched = {k: v for k, v in before.items() if k not in set(dirty)}
    patched.update(incr)
    assert patched == after_full

    # unchanged tiles were already byte-identical across versions
    for k in set(before) & set(after_full) - set(dirty):
        assert before[k] == after_full[k]


def test_changed_tile_keys_covers_pre_and_post_image(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "move"),
                         num_buckets=4, merge_mode="mor")
    t.merge_batch(_mk_actions(spark, [
        ("r", "a.py", c(1), 1, "upsert", "py", "s" * 10, None)]), epoch=1)
    v1 = t._latest_version()
    # big content delta -> the feature crosses into another tile
    t.merge_batch(_mk_actions(spark, [
        ("r", "a.py", c(2), 2, "upsert", "py", "s" * 3000, None)]), epoch=2)
    v2 = t._latest_version()

    feed = _with_coords(
        table_changes(t, v1, v2).filter(F.col("content").isNotNull()))
    dirty = set(mvt.changed_tile_keys(feed, ZOOM))
    old_tile = next(iter(_tiles(
        mvt.retile(_with_coords(t.read(version=v1)), ZOOM))))
    new_tile = next(iter(_tiles(
        mvt.retile(_with_coords(t.read(version=v2)), ZOOM))))
    assert old_tile != new_tile
    assert {old_tile, new_tile} <= dirty


def test_retile_empty_changed_list_is_noop(spark):
    pts = spark.createDataFrame([(1.0, 1.0)], "lon double, lat double")
    assert mvt.retile(pts, ZOOM, changed=[]).count() == 0
