"""vacuum(): orphan-file GC. A crash between the staging write and the
manifest commit leaves data files no manifest references; nothing else ever
removes them (round-2 verdict miss #2)."""

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


def _age(path: str, sec: float = 3600.0) -> None:
    t = os.path.getmtime(path) - sec
    os.utime(path, (t, t))


def test_vacuum_removes_crash_orphans_keeps_live_and_time_travel(
        spark, warehouse):
    path = os.path.join(warehouse, "t")
    t = LakeTable.create(spark, path, num_buckets=2, merge_mode="mor")
    for ep in range(3):
        t.merge_batch(
            _mk_actions(spark, [("r1", "a.py", c(ep + 1), 0, "upsert", "go",
                                 f"v{ep}", "s"),
                                ("r2", "b.py", c(ep + 1), 1, "upsert", "go",
                                 f"w{ep}", "s")]), epoch=ep)
    live_before = {(r["repo"], r["path"]): r["content"]
                   for r in t.read().collect()}
    prev_version = t.manifest()["version"] - 1

    # simulate a crash mid-commit: a staged dir with data but no manifest
    orphan_dir = os.path.join(path, "data", "v99-deadbeef", "_bucket=0")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")

    # age everything past the grace window (a real vacuum runs hours later)
    for dirpath, _d, files in os.walk(path):
        for fn in files:
            _age(os.path.join(dirpath, fn))

    res = t.vacuum(keep_versions=2, grace_sec=300)
    assert not os.path.exists(orphan), "crash orphan must be removed"
    assert res["data_files"] >= 1
    # live state intact
    assert {(r["repo"], r["path"]): r["content"]
            for r in t.read().collect()} == live_before
    # time travel inside the horizon still works
    assert t.read(version=prev_version).count() == 2


def test_vacuum_respects_grace_window(spark, warehouse):
    path = os.path.join(warehouse, "t")
    t = LakeTable.create(spark, path, num_buckets=2, merge_mode="mor")
    t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(1), 0, "upsert", "go", "v", "s")]),
        epoch=0)
    # a FRESH staged dir (in-flight writer about to commit) must survive
    staged = os.path.join(path, "data", "v9-inflight", "_bucket=1")
    os.makedirs(staged)
    fresh = os.path.join(staged, "part-0.parquet")
    with open(fresh, "wb") as f:
        f.write(b"staged")
    res = t.vacuum(keep_versions=1, grace_sec=300)
    assert os.path.exists(fresh), "in-grace staged file must be kept"
    assert res["data_files"] == 0


def test_vacuum_expires_old_manifests_and_shards(spark, warehouse):
    path = os.path.join(warehouse, "t")
    t = LakeTable.create(spark, path, num_buckets=2, merge_mode="mor")
    for ep in range(5):
        t.merge_batch(
            _mk_actions(spark, [("r1", "a.py", c(ep + 1), 0, "upsert", "go",
                                 f"v{ep}", "s")]), epoch=ep)
    t.compact(target_files_per_bucket=1)  # folds deltas -> old shards die
    for dirpath, _d, files in os.walk(path):
        for fn in files:
            _age(os.path.join(dirpath, fn))
    res = t.vacuum(keep_versions=1, grace_sec=300)
    assert res["manifests"] >= 4
    assert res["shards"] >= 4
    assert res["data_files"] >= 4
    assert t.read().count() == 1
    assert t.read().first()["content"] == "v4"
    # a fresh write after vacuum still works
    t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(9), 0, "upsert", "go", "new",
                             "s")]), epoch=5)
    assert t.read().first()["content"] == "new"
