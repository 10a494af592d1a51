"""Table-management surface: history(), table_stats(), clone_to().

clone_to is the zero-copy branch (Delta SHALLOW CLONE analog): hardlinked
data, independent manifests, divergence without interference, vacuum
safety via inode refcounts.
"""

from __future__ import annotations

import os

from skipmap_processor_spark.lake import LakeTable


def _mk_actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, "
        "op string, lang string, content string, content_sha string",
    )


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 24


def _build(spark, path, mode="mor", epochs=3):
    t = LakeTable.create(spark, path, num_buckets=4, merge_mode=mode)
    keys = [("r%d" % (i % 2), "f%02d.py" % i) for i in range(10)]
    for e in range(epochs):
        rows = [(r, p, c(e + 1), i, "upsert", "go", f"v{e + 1}", "s")
                for i, (r, p) in enumerate(keys)]
        t.merge_batch(_mk_actions(spark, rows), epoch=e)
    return t


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_history_shape(spark, warehouse):
    t = _build(spark, os.path.join(warehouse, "t"))
    h = t.history()
    assert [e["version"] for e in h] == [3, 2, 1, 0]
    assert h[-1]["commit_kind"] == "create"
    assert all(e["commit_kind"] == "merge" for e in h[:3])
    assert h[0]["hwm_epoch"] == 2
    t.rescale_buckets(8)
    h2 = t.history(limit=1)
    assert len(h2) == 1 and h2[0]["commit_kind"] == "metadata"
    assert h2[0]["num_buckets"] == 8


def test_table_stats(spark, warehouse):
    t = _build(spark, os.path.join(warehouse, "t"))
    st = t.table_stats()
    assert st["total_rows"] == 30          # 10 keys x 3 delta epochs
    assert st["total_bytes"] > 0
    assert st["files_without_bytes"] == 0
    assert st["max_files_per_bucket"] >= 3  # one delta file per epoch
    assert sum(d["rows"] for d in st["per_bucket"].values()) == 30
    t.compact()
    st2 = t.table_stats()
    assert st2["total_rows"] == 10
    assert st2["max_files_per_bucket"] == 1


def test_clone_zero_copy_and_equality(spark, warehouse):
    src = _build(spark, os.path.join(warehouse, "src"))
    dst = src.clone_to(os.path.join(warehouse, "dst"))
    assert _rows(dst.read()) == _rows(src.read())
    # zero-copy: every clone data file shares its inode with the source
    for fe in dst.file_entries():
        p = os.path.join(dst.path, fe["path"])
        assert os.stat(p).st_nlink >= 2, fe["path"]
    # ingest state carried: same HWM, resumable
    assert dst.hwm_epoch == src.hwm_epoch
    assert dst.manifest()["properties"]["cloned_from"]["source_version"] == 3
    # re-clone onto an existing table refuses
    import pytest

    with pytest.raises(ValueError):
        src.clone_to(os.path.join(warehouse, "dst"))


def test_clone_diverges_independently(spark, warehouse):
    src = _build(spark, os.path.join(warehouse, "src"))
    before = _rows(src.read())
    dst = src.clone_to(os.path.join(warehouse, "dst"))
    # write only to the clone
    dst.merge_batch(_mk_actions(
        spark, [("r0", "f00.py", c(9), 0, "upsert", "go", "branch", "s")]),
        epoch=3)
    assert _rows(src.read()) == before
    got = {(r["repo"], r["path"], r["content"]) for r in dst.read().collect()}
    assert ("r0", "f00.py", "branch") in got
    # and only to the source
    src.merge_batch(_mk_actions(
        spark, [("r1", "f01.py", c(9), 0, "upsert", "go", "main", "s")]),
        epoch=3)
    got_dst = {(r["repo"], r["path"], r["content"])
               for r in dst.read().collect()}
    assert ("r1", "f01.py", "main") not in got_dst


def test_clone_survives_source_vacuum(spark, warehouse):
    src = _build(spark, os.path.join(warehouse, "src"))
    dst = src.clone_to(os.path.join(warehouse, "dst"))
    want = _rows(dst.read())
    # source compacts (obsoleting the delta files the clone links) and
    # vacuums with zero grace: the hardlinked inodes must survive
    src.compact()
    src.vacuum(keep_versions=1, grace_sec=0.0)
    assert _rows(dst.read()) == want
    # and the reverse: clone vacuum never touches source-only files
    dst.compact()
    dst.vacuum(keep_versions=1, grace_sec=0.0)
    assert _rows(src.read()) == want


def test_compaction_plan_and_scoped_compact(spark, warehouse):
    t = _build(spark, os.path.join(warehouse, "t"), epochs=6)
    plan = t.compaction_plan(max_delta_depth=4, min_small_file_bytes=0)
    # every touched bucket has 6 delta files > depth 4
    st = t.table_stats()
    deep = sorted(b for b, d in st["per_bucket"].items() if d["files"] > 4)
    assert plan["buckets"] == deep and plan["rewrite_bytes"] > 0
    # budget cap defers work instead of dropping it silently
    one = t.compaction_plan(max_delta_depth=4, min_small_file_bytes=0,
                            max_rewrite_bytes=1)
    assert len(one["buckets"]) == 1 and one["deferred_buckets"] >= 1
    # scoped round folds only the chosen bucket; the rest keep their chains
    before = _rows(t.read())
    target = plan["buckets"][0]
    t.compact(target_files_per_bucket=4, buckets=[target])
    st2 = t.table_stats()
    assert st2["per_bucket"][target]["files"] == 1
    others = [b for b in deep if b != target]
    assert all(st2["per_bucket"][b]["files"] > 4 for b in others)
    assert _rows(t.read()) == before
    # second round finishes the job
    plan2 = t.compaction_plan(max_delta_depth=4, min_small_file_bytes=0)
    t.compact(target_files_per_bucket=4, buckets=plan2["buckets"])
    assert t.table_stats()["max_files_per_bucket"] == 1
    assert _rows(t.read()) == before


def test_scoped_compact_respects_legacy_coverage(spark, warehouse):
    t = _build(spark, os.path.join(warehouse, "t"), epochs=2)
    t.rescale_buckets(8)
    keys = [("r%d" % (i % 2), "f%02d.py" % i) for i in range(10)]
    t.merge_batch(_mk_actions(
        spark, [(r, p, c(5), i, "upsert", "go", "v5", "s")
                for i, (r, p) in enumerate(keys)]), epoch=2)
    before = _rows(t.read())
    # scope to one legacy bucket's current-space id: the coverage rule must
    # pull in its sibling current buckets so no duplicates survive
    legacy = [fe for fe in t.file_entries() if fe["nb"] == 4]
    assert legacy
    b0 = int(legacy[0]["bucket"])  # current-space id == legacy id % 8 == id
    t.compact(buckets=[b0])
    assert _rows(t.read()) == before
    # the scoped round migrated that legacy bucket
    left = {int(fe["bucket"]) for fe in t.file_entries() if fe["nb"] == 4}
    assert b0 not in left
