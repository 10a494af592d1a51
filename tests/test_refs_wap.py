"""Tags (named snapshot pins) + write-audit-publish via clone branches.

Oracles: a tagged version survives vacuum and reads exactly its snapshot;
publish_from(main <- branch) yields the same table state as applying the
branch's epochs to main directly (LWW commutativity), exactly once.
"""

from __future__ import annotations

import os

import pytest

from skipmap_processor_spark.lake import LakeTable


def _mk_actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, op string, "
        "lang string, content string, content_sha string",
    )


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 24


def _state(t, **kw):
    return sorted(map(tuple, t.read(**kw).select(
        "repo", "path", "commit", "content").collect()))


def test_tag_pins_snapshot_against_vacuum(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=2,
                         merge_mode="mor")
    for i in range(5):
        t.merge_batch(_mk_actions(
            spark, [("r1", "a.py", c(i + 1), 0, "upsert", "go", f"v{i}", "s")]),
            epoch=i)
    tag_v = 2
    t.create_tag("release-1", version=tag_v)
    want = _state(t, version=tag_v)

    rm = t.vacuum(keep_versions=1, grace_sec=0.0)
    assert rm["manifests"] >= 1, "untagged old manifests must expire"
    # the tagged snapshot still reads exactly, by name
    assert _state(t, version="release-1") == want
    assert t.resolve_ref("release-1") == tag_v
    # an untagged expired version is gone
    with pytest.raises(FileNotFoundError):
        t.manifest(1)

    # dropping the tag releases the pin
    assert t.delete_ref("release-1")
    rm2 = t.vacuum(keep_versions=1, grace_sec=0.0)
    assert rm2["manifests"] >= 1
    with pytest.raises(FileNotFoundError):
        t.manifest(tag_v)


def test_tag_create_once_and_validation(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=2,
                         merge_mode="mor")
    t.create_tag("a.b-c_1")
    with pytest.raises(ValueError, match="already exists"):
        t.create_tag("a.b-c_1")
    with pytest.raises(ValueError, match="invalid ref"):
        t.create_tag("bad/name")
    with pytest.raises(FileNotFoundError):
        t.create_tag("future", version=99)
    assert not t.delete_ref("nope")


def test_wap_publish_equals_direct_apply(spark, warehouse):
    main = LakeTable.create(spark, os.path.join(warehouse, "main"),
                            num_buckets=4, merge_mode="mor")
    twin = LakeTable.create(spark, os.path.join(warehouse, "twin"),
                            num_buckets=4, merge_mode="mor")
    e0 = [("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1"),
          ("r2", "b.py", c(1), 1, "upsert", "py", "b1", "s2")]
    e1 = [("r1", "a.py", c(2), 0, "upsert", "go", "v2", "s3")]
    e2 = [("r2", "b.py", c(3), 0, "delete", None, None, None),
          ("r3", "z.py", c(3), 1, "upsert", "rs", "z1", "s4")]
    for t in (main, twin):
        t.merge_batch(_mk_actions(spark, e0), epoch=0)

    # WRITE on a zero-copy branch, AUDIT there, PUBLISH one commit
    branch = main.clone_to(os.path.join(warehouse, "dev"))
    branch.merge_batch(_mk_actions(spark, e1), epoch=1)
    branch.merge_batch(_mk_actions(spark, e2), epoch=2)
    assert branch.read().filter("content is null").count() == 0  # audit
    assert main.hwm_epoch == 0, "main untouched until publish"

    res = main.publish_from(branch)
    assert res["published"] and res["epochs"] == [1, 2]

    # direct-apply twin is the oracle
    twin.merge_batch(_mk_actions(spark, e1), epoch=1)
    twin.merge_batch(_mk_actions(spark, e2), epoch=2)
    assert _state(main) == _state(twin)
    assert main.hwm_epoch == 2
    # published epochs gate redelivery on main
    assert main.epoch_applied(1) and main.epoch_applied(2)

    # idempotent: same branch head is a no-op
    res2 = main.publish_from(branch)
    assert not res2["published"] and res2["reason"] == "already published"
    assert _state(main) == _state(twin)


def test_wap_publish_commutes_with_concurrent_main_writes(spark, warehouse):
    main = LakeTable.create(spark, os.path.join(warehouse, "main"),
                            num_buckets=4, merge_mode="mor")
    main.merge_batch(_mk_actions(
        spark, [("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1")]), epoch=0)
    branch = main.clone_to(os.path.join(warehouse, "dev"))
    branch.merge_batch(_mk_actions(
        spark, [("r2", "b.py", c(2), 0, "upsert", "py", "b1", "s2")]), epoch=1)
    # main moves while the branch is being audited
    main.merge_batch(_mk_actions(
        spark, [("r3", "z.py", c(3), 0, "upsert", "rs", "z1", "s3")]), epoch=2)

    with pytest.raises(ValueError, match="strict WAP"):
        main.publish_from(branch, require_base_unchanged=True)
    res = main.publish_from(branch)  # default: MOR LWW commutes
    assert res["published"]
    got = {r["path"]: r["content"] for r in main.read().collect()}
    assert got == {"a.py": "v1", "b.py": "b1", "z.py": "z1"}
    assert main.epoch_applied(1) and main.epoch_applied(2)


def test_wap_publish_visible_to_changefeed_and_rejects_cow(spark, warehouse):
    from skipmap_processor_spark.changefeed import table_changes

    main = LakeTable.create(spark, os.path.join(warehouse, "main"),
                            num_buckets=4, merge_mode="mor")
    main.merge_batch(_mk_actions(
        spark, [("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1")]), epoch=0)
    v_before = main.manifest()["version"]
    branch = main.clone_to(os.path.join(warehouse, "dev"))
    branch.merge_batch(_mk_actions(
        spark, [("r2", "b.py", c(2), 0, "upsert", "py", "b1", "s2")]), epoch=1)
    main.publish_from(branch)
    feed = table_changes(main, v_before)
    rows = feed.collect()
    assert {(r["repo"], r["_change_type"]) for r in rows} == {("r2", "insert")}

    cow = LakeTable.create(spark, os.path.join(warehouse, "cow"),
                           num_buckets=2, merge_mode="cow")
    cow.merge_batch(_mk_actions(
        spark, [("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1")]), epoch=0)
    cbr = cow.clone_to(os.path.join(warehouse, "cowdev"))
    cbr.merge_batch(_mk_actions(
        spark, [("r2", "b.py", c(2), 0, "upsert", "py", "b1", "s2")]), epoch=1)
    with pytest.raises(ValueError, match="MOR-only"):
        cow.publish_from(cbr)
    # and publishing someone else's branch is refused
    other = LakeTable.create(spark, os.path.join(warehouse, "other"),
                             num_buckets=4, merge_mode="mor")
    with pytest.raises(ValueError, match="clone"):
        other.publish_from(branch)
