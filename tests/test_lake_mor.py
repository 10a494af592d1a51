"""Merge-on-read mode: delta appends, read-time LWW, compaction folding."""

from __future__ import annotations

import os

from skipmap_processor_spark.lake import LakeTable


def _mk_actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, op string, "
        "lang string, content string, content_sha string",
    )


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 24


def test_mor_merge_appends_not_rewrites(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=4,
                         merge_mode="mor")
    t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1")]),
        epoch=0,
    )
    files0 = {fe["path"] for fe in t.file_entries()}
    t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(2), 0, "upsert", "go", "v2", "s2")]),
        epoch=1,
    )
    files1 = {fe["path"] for fe in t.file_entries()}
    assert files0 < files1, "MOR must append, never rewrite existing files"
    assert t.manifest()["properties"]["has_deltas"]
    # read resolves LWW
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["content"] == "v2"


def test_mor_lww_tombstone_and_stale_dup(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=4,
                         merge_mode="mor")
    t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1")]),
        epoch=0,
    )
    t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(3), 0, "delete", None, None, None)]),
        epoch=1,
    )
    # stale duplicate re-delivered after the delete
    t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1")]),
        epoch=2,
    )
    assert t.read().count() == 0, "tombstone must outrank the stale dup"
    tomb = t.read(include_deleted=True, with_engine_cols=True).collect()
    assert len(tomb) == 1 and tomb[0]["is_deleted"]


def test_mor_compact_folds_and_preserves_tombstones(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=2,
                         merge_mode="mor")
    for e in range(4):
        t.merge_batch(
            _mk_actions(
                spark,
                [("r1", "a.py", c(e + 1), 0, "upsert", "go", f"v{e+1}", "s"),
                 ("r2", "b.py", c(100 + e), 0,
                  "delete" if e == 3 else "upsert", None if e == 3 else "go",
                  None if e == 3 else f"w{e}", None if e == 3 else "s")],
            ),
            epoch=e,
        )
    before = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert before == {("r1", "a.py"): "v4"}
    res = t.compact(target_files_per_bucket=1)
    assert res["compacted_buckets"] >= 1
    assert not t.manifest()["properties"]["has_deltas"]
    after = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert after == before
    # tombstone for r2 survived compaction (gates future stale dups)
    tombs = t.read(include_deleted=True, with_engine_cols=True).filter(
        "is_deleted"
    ).collect()
    assert len(tombs) == 1 and tombs[0]["repo"] == "r2"
    # and it still gates: redeliver an old upsert of r2 post-compaction
    t.merge_batch(
        _mk_actions(spark, [("r2", "b.py", c(100), 0, "upsert", "go", "w0", "s")]),
        epoch=9,
    )
    assert t.read().filter("repo='r2'").count() == 0


def test_mor_epoch_hwm(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=2,
                         merge_mode="mor")
    t.merge_batch(
        _mk_actions(spark, [("r", "p", c(1), 0, "upsert", "go", "v1", "s")]),
        epoch=3,
    )
    r = t.merge_batch(
        _mk_actions(spark, [("r", "p", c(9), 0, "upsert", "go", "v9", "s")]),
        epoch=3,
    )
    assert r["skipped"]
    assert t.read().first()["content"] == "v1"
