"""Change feed (CDC out) + incremental materialized views.

Oracle strategy: the feed's contract is "net live-view diff between two
snapshots", so every test checks the feed against the trivially-correct
oracle — reconstruct both snapshots with ``LakeTable.read(version=...)``
and diff them driver-side — rather than against hand-enumerated rows.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from skipmap_processor_spark.changefeed import (
    IncrementalView,
    VersionExpired,
    table_changes,
)
from skipmap_processor_spark.lake import LakeTable


def _mk_actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, op string, "
        "lang string, content string, content_sha string",
    )


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 24


def _snapshot(t: LakeTable, version: int) -> tuple[dict, dict]:
    """Oracle: (live rows, tombstone ords) at a version."""
    rows = t.read(version=version, with_engine_cols=True,
                  include_deleted=True).collect()
    live = {
        (r["repo"], r["path"]): (r["lang"], r["content"], r["content_sha"],
                                 r["commit"], r["event_seq"])
        for r in rows if not r["is_deleted"]
    }
    tombs = {
        (r["repo"], r["path"]): (r["commit"], r["event_seq"])
        for r in rows if r["is_deleted"]
    }
    return live, tombs


def _oracle_changes(t: LakeTable, v_from: int, v_to: int) -> dict:
    pre, _ = _snapshot(t, v_from)
    post, post_tombs = _snapshot(t, v_to)
    out: dict = {}
    for k in pre.keys() | post.keys():
        a, b = pre.get(k), post.get(k)
        if a is None and b is not None:
            out[k] = {("insert", b)}
        elif a is not None and b is None:
            # delete: pre payload, tombstone ord (pre ord if GC'd)
            ordv = post_tombs.get(k, (a[3], a[4]))
            out[k] = {("delete", a[:3] + ordv)}
        elif a != b:
            out[k] = {("update_preimage", a), ("update_postimage", b)}
    return out


def _feed_changes(t: LakeTable, v_from: int, v_to: int) -> dict:
    out: dict = {}
    for r in table_changes(t, v_from, v_to).collect():
        k = (r["repo"], r["path"])
        out.setdefault(k, set()).add(
            (r["_change_type"],
             (r["lang"], r["content"], r["content_sha"],
              r["commit"], r["event_seq"]))
        )
    return out


def _assert_feed_matches_oracle(t: LakeTable, v_from: int, v_to: int):
    assert _feed_changes(t, v_from, v_to) == _oracle_changes(t, v_from, v_to)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_insert_update_delete_classes(spark, warehouse, mode):
    t = LakeTable.create(spark, os.path.join(warehouse, f"t_{mode}"),
                         num_buckets=4, merge_mode=mode)
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "v1", "s1"),
        ("r1", "b.py", c(1), 1, "upsert", "python", "w1", "s2"),
        ("r1", "c.py", c(1), 2, "upsert", "go", "x1", "s3"),
    ]), epoch=0)
    v1 = t._latest_version()
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(2), 0, "upsert", "python", "v2", "s4"),   # update
        ("r1", "b.py", c(2), 1, "delete", None, None, None),       # delete
        ("r1", "d.py", c(2), 2, "upsert", "rust", "y1", "s5"),     # insert
    ]), epoch=1)
    v2 = t._latest_version()

    feed = _feed_changes(t, v1, v2)
    assert feed == _oracle_changes(t, v1, v2)
    assert {ct for ct, _ in feed[("r1", "a.py")]} == {
        "update_preimage", "update_postimage"}
    assert {ct for ct, _ in feed[("r1", "b.py")]} == {"delete"}
    assert {ct for ct, _ in feed[("r1", "d.py")]} == {"insert"}
    assert ("r1", "c.py") not in feed  # untouched key: no row even if its
    # bucket was rewritten (CoW carries it into a new file)

    # from the create version: everything alive at v2 is an insert
    _assert_feed_matches_oracle(t, 0, v2)
    # degenerate range
    assert table_changes(t, v2, v2).count() == 0


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_net_semantics_collapse(spark, warehouse, mode):
    """Intermediate states inside the range are not replayed."""
    t = LakeTable.create(spark, os.path.join(warehouse, f"n_{mode}"),
                         num_buckets=4, merge_mode=mode)
    t.merge_batch(_mk_actions(spark, [
        ("r1", "keep.py", c(1), 0, "upsert", "go", "k1", "s1"),
    ]), epoch=0)
    v1 = t._latest_version()
    # key born and killed inside the range -> no net change
    t.merge_batch(_mk_actions(spark, [
        ("r1", "ephemeral.py", c(2), 0, "upsert", "go", "e1", "s2"),
    ]), epoch=1)
    t.merge_batch(_mk_actions(spark, [
        ("r1", "ephemeral.py", c(3), 0, "delete", None, None, None),
        ("r1", "keep.py", c(3), 1, "upsert", "go", "k2", "s3"),
    ]), epoch=2)
    # updated twice -> single pre/post pair, post = final image
    t.merge_batch(_mk_actions(spark, [
        ("r1", "keep.py", c(4), 0, "upsert", "go", "k3", "s4"),
    ]), epoch=3)
    v4 = t._latest_version()

    feed = _feed_changes(t, v1, v4)
    assert feed == _oracle_changes(t, v1, v4)
    assert ("r1", "ephemeral.py") not in feed
    pair = feed[("r1", "keep.py")]
    assert {ct for ct, _ in pair} == {"update_preimage", "update_postimage"}
    post = next(img for ct, img in pair if ct == "update_postimage")
    assert post[1] == "k3" and post[3] == c(4)


def test_stale_duplicate_emits_nothing(spark, warehouse):
    """A redelivered older-ord row adds a file (so its key is a candidate)
    but pre == post -> the feed must stay empty."""
    t = LakeTable.create(spark, os.path.join(warehouse, "dup"),
                         num_buckets=4, merge_mode="mor")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(5), 0, "upsert", "go", "v5", "s5"),
    ]), epoch=0)
    v1 = t._latest_version()
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(2), 0, "upsert", "go", "v2", "s2"),  # stale dup
    ]), epoch=1)
    v2 = t._latest_version()
    assert table_changes(t, v1, v2).count() == 0


def test_compact_and_ddl_commits_are_skipped(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "cmp"),
                         num_buckets=4, merge_mode="mor")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1"),
        ("r1", "b.py", c(1), 1, "upsert", "go", "w1", "s2"),
    ]), epoch=0)
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(2), 0, "upsert", "go", "v2", "s3"),
    ]), epoch=1)
    v_merge = t._latest_version()
    t.compact()
    v_compact = t._latest_version()
    assert v_compact > v_merge
    # compaction folds LWW dups but changes no live row -> empty feed
    assert table_changes(t, v_merge, v_compact).count() == 0
    # DDL commit: also invisible
    t.add_column("stars", "bigint")
    v_ddl = t._latest_version()
    assert table_changes(t, v_merge, v_ddl).count() == 0
    # a range spanning merge -> compact -> ddl still reports the merge
    _assert_feed_matches_oracle(t, 0, v_ddl)


def test_schema_evolution_binds_to_target_names(spark, warehouse):
    """Rename between from and to: both images come out under to-names."""
    t = LakeTable.create(spark, os.path.join(warehouse, "evo"),
                         num_buckets=4, merge_mode="cow")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "old", "s1"),
    ]), epoch=0)
    v1 = t._latest_version()
    assert t.rename_column("content", "body")
    acts = spark.createDataFrame(
        [("r1", "a.py", c(2), 0, "upsert", "python", "new", "s2")],
        "repo string, path string, commit string, event_seq bigint, "
        "op string, lang string, body string, content_sha string",
    )
    t.merge_batch(acts, epoch=1)
    v2 = t._latest_version()
    feed = table_changes(t, v1, v2)
    assert "body" in feed.columns and "content" not in feed.columns
    rows = {r["_change_type"]: r for r in feed.collect()}
    assert rows["update_preimage"]["body"] == "old"
    assert rows["update_postimage"]["body"] == "new"


def test_version_expired_after_vacuum(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "vac"),
                         num_buckets=4, merge_mode="cow")
    for e in range(5):
        t.merge_batch(_mk_actions(spark, [
            ("r1", "a.py", c(e + 1), 0, "upsert", "go", f"v{e}", "s"),
        ]), epoch=e)
    t.vacuum(keep_versions=2, grace_sec=0.0)
    with pytest.raises(VersionExpired):
        table_changes(t, 0, t._latest_version()).count()


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_incremental_view_matches_full_rebuild(spark, warehouse, tmp_path, mode):
    t = LakeTable.create(spark, os.path.join(warehouse, f"iv_{mode}"),
                         num_buckets=4, merge_mode=mode)
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "aaaa", "s1"),
        ("r1", "b.py", c(1), 1, "upsert", "python", "bb", "s2"),
        ("r1", "c.go", c(1), 2, "upsert", "go", "cccccc", "s3"),
    ]), epoch=0)
    view = IncrementalView(
        spark, t, str(tmp_path / f"view_{mode}"),
        group_cols=["lang"],
        metrics={"n_files": "1", "total_bytes": "length(content)"},
    )
    assert view.refresh()["mode"] == "full"
    assert view.refresh()["mode"] == "noop"

    # churn: update, group-moving update (python -> ts: -pre from one
    # group, +post to another), delete (kills the go group), insert
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(2), 0, "upsert", "python", "aaaaaaaa", "s4"),
        ("r1", "b.py", c(2), 3, "upsert", "ts", "bb2", "s6"),
        ("r1", "c.go", c(2), 1, "delete", None, None, None),
        ("r1", "d.rs", c(2), 2, "upsert", "rust", "ddd", "s5"),
    ]), epoch=1)
    r = view.refresh()
    assert r["mode"] == "incremental"

    expected = {
        (row["lang"]): (row["n_files"], row["total_bytes"])
        for row in t.read()
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_files"),
             F.sum(F.length("content")).alias("total_bytes"))
        .collect()
    }
    got = {
        row["lang"]: (row["n_files"], row["total_bytes"])
        for row in view.read().collect()
    }
    assert got == expected
    assert "go" not in got  # zero-count group dropped, not left at 0

    # second incremental round on top of the first
    t.merge_batch(_mk_actions(spark, [
        ("r1", "e.rs", c(3), 0, "upsert", "rust", "ee", "s6"),
    ]), epoch=2)
    assert view.refresh()["mode"] == "incremental"
    assert {r["lang"]: r["n_files"] for r in view.read().collect()} == {
        "python": 1, "ts": 1, "rust": 2}


def test_incremental_view_rebuilds_after_expiry(spark, warehouse, tmp_path):
    t = LakeTable.create(spark, os.path.join(warehouse, "ivx"),
                         num_buckets=4, merge_mode="cow")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1"),
    ]), epoch=0)
    view = IncrementalView(spark, t, str(tmp_path / "viewx"),
                           group_cols=["lang"], metrics={"n_files": "1"})
    view.refresh()
    for e in range(1, 6):
        t.merge_batch(_mk_actions(spark, [
            ("r1", f"f{e}.go", c(e + 1), 0, "upsert", "go", "x", "s"),
        ]), epoch=e)
    t.vacuum(keep_versions=2, grace_sec=0.0)
    r = view.refresh()
    assert r["mode"] == "full"  # window lost -> clean rebuild, not a guess
    assert view.read().collect()[0]["n_files"] == 6


# ----------------------------------------------------------- FeedFollower

def _live(t: LakeTable) -> set:
    return {tuple(r) for r in t.read().collect()}


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_follower_cascade_equals_upstream(spark, warehouse, mode):
    from skipmap_processor_spark.changefeed import FeedFollower

    up = LakeTable.create(spark, os.path.join(warehouse, f"up_{mode}"),
                          num_buckets=4, merge_mode=mode)
    down = LakeTable.create(spark, os.path.join(warehouse, f"dn_{mode}"),
                            num_buckets=4, merge_mode=mode)
    f = FeedFollower(up, down)

    up.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "v1", "s1"),
        ("r1", "b.py", c(1), 1, "upsert", "go", "w1", "s2"),
    ]), epoch=0)
    assert f.sync()["mode"] == "full"     # bootstrap
    assert _live(down) == _live(up)
    assert f.sync()["mode"] == "noop"

    up.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(2), 0, "upsert", "python", "v2", "s3"),
        ("r1", "b.py", c(2), 1, "delete", None, None, None),
        ("r1", "c.py", c(2), 2, "upsert", "rust", "x1", "s4"),
    ]), epoch=1)
    r = f.sync()
    assert r["mode"] == "incremental"
    assert _live(down) == _live(up)

    # multi-version catch-up in one sync
    up.merge_batch(_mk_actions(spark, [
        ("r1", "c.py", c(3), 0, "upsert", "rust", "x2", "s5"),
    ]), epoch=2)
    up.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(4), 0, "delete", None, None, None),
    ]), epoch=3)
    assert f.sync()["mode"] == "incremental"
    assert _live(down) == _live(up)
    # redelivery: a second follower instance sees the committed cursor
    f2 = FeedFollower(up, down)
    assert f2.sync()["mode"] == "noop"


def test_follower_filtered_view_transform(spark, warehouse):
    """Predicate view: updates moving a key out of the predicate become
    deletes downstream (not silently dropped)."""
    from skipmap_processor_spark.changefeed import FeedFollower

    up = LakeTable.create(spark, os.path.join(warehouse, "upf"),
                          num_buckets=4, merge_mode="cow")
    down = LakeTable.create(spark, os.path.join(warehouse, "dnf"),
                            num_buckets=4, merge_mode="cow")

    def only_python(acts):
        keep = (F.col("op") == "delete") | (F.col("lang") == "python")
        return acts.withColumn(
            "op", F.when(keep, F.col("op")).otherwise(F.lit("delete")))

    f = FeedFollower(up, down, transform=only_python)
    up.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "v1", "s1"),
        ("r1", "b.go", c(1), 1, "upsert", "go", "w1", "s2"),
    ]), epoch=0)
    f.sync()
    assert {r["path"] for r in down.read().collect()} == {"a.py"}

    # a.py leaves the predicate via an update -> must disappear downstream
    up.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(2), 0, "upsert", "go", "v2", "s3"),
    ]), epoch=1)
    f.sync()
    assert down.read().count() == 0


def test_follower_resync_after_vacuum(spark, warehouse):
    from skipmap_processor_spark.changefeed import FeedFollower

    up = LakeTable.create(spark, os.path.join(warehouse, "upv"),
                          num_buckets=4, merge_mode="cow")
    down = LakeTable.create(spark, os.path.join(warehouse, "dnv"),
                            num_buckets=4, merge_mode="cow")
    f = FeedFollower(up, down)
    up.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1"),
    ]), epoch=0)
    f.sync()
    for e in range(1, 6):
        up.merge_batch(_mk_actions(spark, [
            ("r1", "a.py", c(e + 1), 0, "upsert", "go", f"v{e}", "s"),
            ("r1", f"f{e}.go", c(e + 1), 1, "upsert", "go", "x", "s"),
        ]), epoch=e)
    up.vacuum(keep_versions=2, grace_sec=0.0)
    r = f.sync()
    assert r["mode"] == "full"  # cursor's manifest gone -> snapshot replay
    assert _live(down) == _live(up)
    assert f.sync()["mode"] == "noop"


def test_follower_stale_downstream_raises(spark, warehouse):
    from skipmap_processor_spark.changefeed import FeedFollower, StaleDownstream

    up = LakeTable.create(spark, os.path.join(warehouse, "ups"),
                          num_buckets=4, merge_mode="mor")
    down = LakeTable.create(spark, os.path.join(warehouse, "dns"),
                            num_buckets=4, merge_mode="mor")
    f = FeedFollower(up, down)
    up.merge_batch(_mk_actions(spark, [
        ("r1", "doomed.py", c(1), 0, "upsert", "go", "v1", "s1"),
    ]), epoch=0)
    f.sync()
    up.merge_batch(_mk_actions(spark, [
        ("r1", "doomed.py", c(2), 0, "delete", None, None, None),
    ]), epoch=1)
    for e in range(2, 6):
        up.merge_batch(_mk_actions(spark, [
            ("r1", f"f{e}.go", c(e + 1), 0, "upsert", "go", "x", "s"),
        ]), epoch=e)
    # GC the tombstone, then expire the manifests the cursor needs
    up.compact(retention_epochs=1)
    up.vacuum(keep_versions=1, grace_sec=0.0)
    with pytest.raises(StaleDownstream):
        f.sync()


# ------------------------------------------- catch-up across wide ranges

def _fabric_commit(t: LakeTable, kind="merge", add=None, origin="append",
                   drop_paths=None) -> int:
    """Commit a manifest through the real CAS machinery without running a
    Spark job — metadata-fabric for walk-cost tests. Entries reference
    synthetic data paths; only discovery (never the data path) runs."""
    mani = t.manifest(t._latest_version())
    if drop_paths:
        t._rewrite_shards(mani, lambda fe: fe["path"] in drop_paths)
    if add:
        mani["shards"] = mani.get("shards", []) + [
            t._write_shard(add, origin=origin)]
    mani["commit_kind"] = kind
    mani["version"] = t._latest_version() + 1
    t._commit_manifest(mani)
    return mani["version"]


def test_catchup_discovery_o_changes_over_520_versions(spark, warehouse):
    """VERDICT r4 item 5: a consumer resuming across hundreds of commits
    pays O(changes) driver work, not O(versions × table files). With
    origin-tagged shards, discovery (a) NEVER rebuilds a snapshot path set
    (file_entries is never called), (b) loads each appended shard exactly
    once, and (c) skips rewrite-replacement and compact-output shards
    without loading them."""
    from skipmap_processor_spark.changefeed import _added_entries

    t = LakeTable.create(spark, os.path.join(warehouse, "fab"),
                         num_buckets=4, merge_mode="mor")
    v0 = t._latest_version()
    expected, live_paths = [], []
    for i in range(520):
        if i % 50 == 17 and len(live_paths) >= 4:
            folded = set(live_paths[:4])
            newp = f"data/fold-{i}.parquet"
            _fabric_commit(t, kind="compact",
                           add=[{"path": newp, "bucket": 0, "rows": 8}],
                           drop_paths=folded)
            live_paths = [p for p in live_paths if p not in folded] + [newp]
        elif i % 50 == 33:
            _fabric_commit(t, kind="metadata")
        else:
            p = f"data/trickle-{i}.parquet"
            _fabric_commit(t, add=[{"path": p, "bucket": i % 4, "rows": 1}])
            live_paths.append(p)
            expected.append(p)
    latest = t._latest_version()
    assert latest - v0 >= 520

    loads: list[str] = []
    orig_load = t._load_shard

    def spy_load(rel):
        loads.append(rel)
        return orig_load(rel)

    def no_snapshot(*a, **k):
        raise AssertionError(
            "file_entries called during discovery — the "
            "O(versions × files) walk resurfaced")

    t._load_shard = spy_load
    t.file_entries = no_snapshot
    try:
        ents = _added_entries(t, v0, latest)
    finally:
        del t.file_entries
        del t._load_shard
    assert {fe["path"] for fe in ents} == set(expected)
    # one load per appended trickle shard, nothing else, no repeats
    assert len(loads) == len(expected) and len(set(loads)) == len(loads)


def test_catchup_legacy_untagged_manifests(spark, warehouse):
    """Pre-tag manifests (no `origin` on shard descriptors) still produce a
    correct feed via the cumulative snapshot-set fallback."""
    import json as _json

    t = LakeTable.create(spark, os.path.join(warehouse, "leg"),
                         num_buckets=4, merge_mode="cow")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1"),
        ("r1", "b.py", c(1), 1, "upsert", "go", "w1", "s2"),
    ]), epoch=0)
    v_boot = t._latest_version()
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(2), 0, "upsert", "go", "v2", "s3"),
        ("r2", "c.py", c(2), 1, "upsert", "py", "x1", "s4"),
    ]), epoch=1)
    t.compact()
    t.merge_batch(_mk_actions(spark, [
        ("r1", "b.py", c(3), 0, "delete", None, None, None),
    ]), epoch=2)
    latest = t._latest_version()
    # strip every origin tag on disk (simulate a pre-tag table), clear caches
    mdir = os.path.join(t.path, "manifests")
    for fn in os.listdir(mdir):
        fp = os.path.join(mdir, fn)
        with open(fp) as f:
            doc = _json.load(f)
        if fn.startswith("v"):
            for sd in doc.get("shards", []):
                sd.pop("origin", None)
            with open(fp, "w") as f:
                _json.dump(doc, f)
    t.__dict__.pop("_shard_cache", None)
    _assert_feed_matches_oracle(t, v_boot, latest)
    _assert_feed_matches_oracle(t, 0, latest)


def test_follower_catchup_across_120_version_trickle(spark, warehouse):
    """End-to-end wide-range catch-up: 120 one-row trickle merges (with a
    compact mid-range), one table_changes over the whole range matches the
    snapshot-diff oracle, and a FeedFollower syncs the range in ONE
    incremental merge that leaves the downstream row-equal with upstream."""
    from skipmap_processor_spark.changefeed import FeedFollower

    up = LakeTable.create(spark, os.path.join(warehouse, "wup"),
                          num_buckets=4, merge_mode="mor")
    down = LakeTable.create(spark, os.path.join(warehouse, "wdn"),
                            num_buckets=4, merge_mode="mor")
    up.merge_batch(_mk_actions(spark, [
        ("r0", "seed.py", c(0), 0, "upsert", "py", "seed", "s0"),
    ]), epoch=0)
    f = FeedFollower(up, down)
    f.sync()
    v_cursor = f.cursor()
    for i in range(1, 121):
        if i % 7 == 3:
            rows = [("r1", f"f{i % 11}.py", c(i), 0, "delete",
                     None, None, None)]
        else:
            rows = [("r1", f"f{i % 11}.py", c(i), 0, "upsert",
                     "py", f"v{i}", f"s{i}")]
        up.merge_batch(_mk_actions(spark, rows), epoch=i)
        if i == 60:
            up.compact()
    latest = up._latest_version()
    assert latest - v_cursor >= 120
    _assert_feed_matches_oracle(up, v_cursor, latest)
    r = f.sync()
    assert r["mode"] == "incremental" and r["from_cursor"] == v_cursor
    cols = ["repo", "path", "commit", "event_seq", "lang", "content",
            "content_sha"]
    up_rows = sorted(tuple(x) for x in up.read().select(*cols).collect())
    dn_rows = sorted(tuple(x) for x in down.read().select(*cols).collect())
    assert up_rows == dn_rows


# ------------------------------------------------- extrema (min/max) IVM

def _ext_oracle(t: LakeTable, group: str) -> dict:
    return {
        r[group]: (r["n_files"], r["max_bytes"], r["min_bytes"])
        for r in t.read().groupBy(group).agg(
            F.count(F.lit(1)).alias("n_files"),
            F.max(F.length("content")).alias("max_bytes"),
            F.min(F.length("content")).alias("min_bytes"),
        ).collect()
    }


def _ext_view(view: IncrementalView, group: str) -> dict:
    return {
        r[group]: (r["n_files"], r["max_bytes"], r["min_bytes"])
        for r in view.read().collect()
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_extrema_incremental_matches_oracle(spark, warehouse, tmp_path,
                                            mode):
    t = LakeTable.create(spark, os.path.join(warehouse, f"ext_{mode}"),
                         num_buckets=4, merge_mode=mode)
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "aaaaaaaa", "s1"),  # 8
        ("r1", "b.py", c(1), 1, "upsert", "python", "bb", "s2"),       # 2
        ("r1", "c.go", c(1), 2, "upsert", "go", "cccccc", "s3"),       # 6
        ("r1", "d.go", c(1), 3, "upsert", "go", "dd", "s4"),           # 2
    ]), epoch=0)
    view = IncrementalView(
        spark, t, str(tmp_path / f"ext_{mode}"),
        group_cols=["lang"], metrics={"n_files": "1"},
        extrema={"max_bytes": ("max", "length(content)"),
                 "min_bytes": ("min", "length(content)")},
    )
    assert view.refresh()["mode"] == "full"
    assert _ext_view(view, "lang") == _ext_oracle(t, "lang")

    # additions only (one beats the stored max): zero recomputes, exact
    t.merge_batch(_mk_actions(spark, [
        ("r1", "e.py", c(2), 0, "upsert", "python", "e" * 12, "s5"),
        ("r1", "f.go", c(2), 1, "upsert", "go", "fff", "s6"),
    ]), epoch=1)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert r["ext_recomputed_groups"] == 0
    assert _ext_view(view, "lang") == _ext_oracle(t, "lang")

    # retraction of a NON-extremal row: provably can't move min or max
    # (2 < stored min 2? ties! b.py at 2 ties the python min) — use a
    # middle-valued go row instead; go has {6, 2, 3}: delete the 3
    t.merge_batch(_mk_actions(spark, [
        ("r1", "f.go", c(3), 0, "delete", None, None, None),
    ]), epoch=2)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert r["ext_recomputed_groups"] == 0
    assert _ext_view(view, "lang") == _ext_oracle(t, "lang")

    # delete the python max (12): the buffered runner-up resolves it with
    # NO table access (r5 verdict item 1) — zero recomputed groups
    t.merge_batch(_mk_actions(spark, [
        ("r1", "e.py", c(4), 0, "delete", None, None, None),
    ]), epoch=3)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert r["ext_recomputed_groups"] == 0
    assert _ext_view(view, "lang") == _ext_oracle(t, "lang")

    # update shrinks the current go max (6 -> 1): pre-image retraction of
    # the extremum, again resolved from the buffer; also moves the go min
    t.merge_batch(_mk_actions(spark, [
        ("r1", "c.go", c(5), 0, "upsert", "go", "c", "s7"),
    ]), epoch=4)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert r["ext_recomputed_groups"] == 0
    assert _ext_view(view, "lang") == _ext_oracle(t, "lang")

    # group-moving update: python max row hops to a brand-new group
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(6), 0, "upsert", "rust", "aaaaaaaa", "s8"),
    ]), epoch=5)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert _ext_view(view, "lang") == _ext_oracle(t, "lang")


def test_extrema_repo_grouped_prunes_and_matches(spark, warehouse,
                                                 tmp_path):
    t = LakeTable.create(spark, os.path.join(warehouse, "ext_repo"),
                         num_buckets=4, merge_mode="mor")
    rows = []
    for i in range(8):
        for j in range(4):
            rows.append((f"repo{i}", f"f{j}.py", c(1), i * 4 + j,
                         "upsert", "python", "x" * (j + 1), f"s{i}{j}"))
    t.merge_batch(_mk_actions(spark, rows), epoch=0)
    view = IncrementalView(
        spark, t, str(tmp_path / "ext_repo"),
        group_cols=["repo"], metrics={"n_files": "1"},
        extrema={"max_bytes": ("max", "length(content)"),
                 "min_bytes": ("min", "length(content)")},
        # K=1 drains the buffer on the first extremum retraction, forcing
        # the repo-pruned rescan path this test exists to exercise
        ext_buffer_k=1,
    )
    view.refresh()
    # retract the max of exactly one repo -> repo-pruned recompute scan
    t.merge_batch(_mk_actions(spark, [
        ("repo3", "f3.py", c(2), 0, "delete", None, None, None),
    ]), epoch=1)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert r["ext_recomputed_groups"] == 1
    assert _ext_view(view, "repo") == _ext_oracle(t, "repo")


def test_extrema_cap_falls_back_to_rebuild(spark, warehouse, tmp_path,
                                           monkeypatch):
    import skipmap_processor_spark.changefeed as cfm
    t = LakeTable.create(spark, os.path.join(warehouse, "ext_cap"),
                         num_buckets=4, merge_mode="mor")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "aaaa", "s1"),
        ("r1", "b.py", c(1), 1, "upsert", "python", "b", "s2"),
        ("r1", "c.go", c(1), 2, "upsert", "go", "cccc", "s3"),
        ("r1", "d.go", c(1), 3, "upsert", "go", "d", "s4"),
    ]), epoch=0)
    view = IncrementalView(
        spark, t, str(tmp_path / "ext_cap"),
        group_cols=["lang"], metrics={"n_files": "1"},
        extrema={"max_bytes": ("max", "length(content)"),
                 "min_bytes": ("min", "length(content)")},
        ext_buffer_k=1,  # drain on first retraction -> recompute path
    )
    view.refresh()
    # retract BOTH groups' maxima with the cap at 1 -> honest full rebuild
    monkeypatch.setattr(cfm, "_EXT_RECOMPUTE_CAP", 1)
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(2), 0, "delete", None, None, None),
        ("r1", "c.go", c(2), 1, "delete", None, None, None),
    ]), epoch=1)
    r = view.refresh()
    assert r["mode"] == "full"
    assert r["reason"] == "ext_recompute_cap"
    assert _ext_view(view, "lang") == _ext_oracle(t, "lang")


def test_extrema_buffer_runnerup_and_drain(spark, warehouse, tmp_path):
    """Focused buffer-state checks (the r6 optimization): a retraction of
    the extremum resolves from the buffered runner-up without a scan; a
    duplicated extremum survives a single retraction via its exact count;
    retracting every buffered value drains the buffer and falls back to
    the (counted) live recompute."""
    t = LakeTable.create(spark, os.path.join(warehouse, "ext_buf"),
                         num_buckets=4, merge_mode="mor")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "x" * 9, "s1"),
        ("r1", "b.py", c(1), 1, "upsert", "python", "y" * 9, "s2"),  # dup 9
        ("r1", "c.py", c(1), 2, "upsert", "python", "x" * 8, "s3"),
        ("r1", "d.py", c(1), 3, "upsert", "python", "x" * 7, "s4"),
        ("r1", "e.py", c(1), 4, "upsert", "python", "x" * 6, "s5"),
    ]), epoch=0)
    view = IncrementalView(
        spark, t, str(tmp_path / "ext_buf"),
        group_cols=["lang"], metrics={"n_files": "1"},
        extrema={"max_bytes": ("max", "length(content)"),
                 "min_bytes": ("min", "length(content)")},
        ext_buffer_k=2,  # buffer holds {9 x2, 8} for max, {6, 7} for min
    )
    assert view.refresh()["mode"] == "full"

    # delete ONE of the two max-9 rows: count 2 -> 1, max stays 9, no scan
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(2), 0, "delete", None, None, None),
    ]), epoch=1)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert r["ext_recomputed_groups"] == 0
    assert _ext_view(view, "lang") == _ext_oracle(t, "lang")

    # delete the last 9 AND the 8 in one batch: both buffered max values
    # drain -> live recompute of the one group finds 7 exactly
    t.merge_batch(_mk_actions(spark, [
        ("r1", "b.py", c(3), 0, "delete", None, None, None),
        ("r1", "c.py", c(3), 1, "delete", None, None, None),
    ]), epoch=2)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert r["ext_recomputed_groups"] == 1
    assert _ext_view(view, "lang") == _ext_oracle(t, "lang")
    assert _ext_view(view, "lang")["python"] == (2, 7, 6)

    # after the recompute rebuilt the buffer {7, 6}: retract the max again
    # -> runner-up (6) resolves it without another scan
    t.merge_batch(_mk_actions(spark, [
        ("r1", "d.py", c(4), 0, "delete", None, None, None),
    ]), epoch=3)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert r["ext_recomputed_groups"] == 0
    assert _ext_view(view, "lang")["python"] == (1, 6, 6)


def test_extrema_buffer_full_group_retraction(spark, warehouse, tmp_path):
    """A group whose every row is retracted disappears; re-inserting rows
    later rebuilds the buffer from the additions alone (the exact counts
    prove the empty buffer holds 'the whole group')."""
    t = LakeTable.create(spark, os.path.join(warehouse, "ext_gone"),
                         num_buckets=4, merge_mode="mor")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "aaaa", "s1"),
        ("r1", "b.go", c(1), 1, "upsert", "go", "bb", "s2"),
    ]), epoch=0)
    view = IncrementalView(
        spark, t, str(tmp_path / "ext_gone"),
        group_cols=["lang"], metrics={"n_files": "1"},
        extrema={"max_bytes": ("max", "length(content)"),
                 "min_bytes": ("min", "length(content)")},
        ext_buffer_k=2,
    )
    assert view.refresh()["mode"] == "full"
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(2), 0, "delete", None, None, None),
    ]), epoch=1)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert r["ext_recomputed_groups"] == 0
    assert set(_ext_view(view, "lang")) == {"go"}
    t.merge_batch(_mk_actions(spark, [
        ("r1", "n1.py", c(3), 0, "upsert", "python", "nnn", "s3"),
        ("r1", "n2.py", c(3), 1, "upsert", "python", "n", "s4"),
    ]), epoch=2)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert r["ext_recomputed_groups"] == 0
    assert _ext_view(view, "lang") == _ext_oracle(t, "lang")
    assert _ext_view(view, "lang")["python"] == (2, 3, 1)


def test_extrema_config_change_rebuilds(spark, warehouse, tmp_path):
    t = LakeTable.create(spark, os.path.join(warehouse, "ext_cfg"),
                         num_buckets=4, merge_mode="mor")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "aaaa", "s1"),
    ]), epoch=0)
    plain = IncrementalView(spark, t, str(tmp_path / "ext_cfg"),
                            group_cols=["lang"], metrics={"n_files": "1"})
    assert plain.refresh()["mode"] == "full"
    # same path, extrema added: incremental merge would be wrong -> rebuild
    withext = IncrementalView(
        spark, t, str(tmp_path / "ext_cfg"),
        group_cols=["lang"], metrics={"n_files": "1"},
        extrema={"max_bytes": ("max", "length(content)"),
                 "min_bytes": ("min", "length(content)")},
    )
    r = withext.refresh()
    assert r["mode"] == "full"
    assert r["reason"] == "config_changed"
    assert _ext_view(withext, "lang") == _ext_oracle(t, "lang")


def test_extrema_rejects_bad_config(spark, warehouse, tmp_path):
    t = LakeTable.create(spark, os.path.join(warehouse, "ext_bad"),
                         num_buckets=4, merge_mode="mor")
    with pytest.raises(ValueError, match="min.*max|must be"):
        IncrementalView(spark, t, str(tmp_path / "b1"), group_cols=["lang"],
                        metrics={}, extrema={"m": ("avg", "length(content)")})
    with pytest.raises(ValueError, match="collides"):
        IncrementalView(spark, t, str(tmp_path / "b2"), group_cols=["lang"],
                        metrics={"m": "1"}, extrema={"m": ("max", "1")})


# ------------------------------------------------ dimension-enriched views

def _mk_dim(spark, path, rows, schema="lang string, tier string"):
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(path)


def _dim_oracle(t: LakeTable, spark, dim_path: str, group: str) -> dict:
    dim = spark.read.parquet(dim_path)
    return {
        row[group]: (row["n"], row["b"])
        for row in t.read().join(dim, "lang", "left")
        .groupBy(group)
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.length("content")).alias("b"))
        .collect()
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_dim_enriched_view_incremental_matches_oracle(
        spark, warehouse, tmp_path, mode):
    """Star-join IVM: group by a broadcast-dimension attribute; the signed
    fold stays exact because the dimension is fixed across the range."""
    t = LakeTable.create(spark, os.path.join(warehouse, f"dimv_{mode}"),
                         num_buckets=4, merge_mode=mode)
    dim_path = str(tmp_path / "dim")
    _mk_dim(spark, dim_path, [("python", "scripting"), ("go", "compiled"),
                              ("rust", "compiled")])
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "aaaa", "s1"),
        ("r1", "b.go", c(1), 1, "upsert", "go", "bb", "s2"),
        ("r1", "c.rs", c(1), 2, "upsert", "rust", "cccccc", "s3"),
        ("r1", "d.sh", c(1), 3, "upsert", "shell", "dd", "s4"),  # no dim row
    ]), epoch=0)
    view = IncrementalView(
        spark, t, str(tmp_path / f"dv_{mode}"), group_cols=["tier"],
        metrics={"n": "1", "b": "length(content)"},
        dim_path=dim_path, dim_on=["lang"])
    assert view.refresh()["mode"] == "full"
    got = {r["tier"]: (r["n"], r["b"]) for r in view.read().collect()}
    assert got == _dim_oracle(t, spark, dim_path, "tier")
    assert None in got  # unmatched lang lands in the null tier, not dropped

    # churn: tier-moving update (go->python flips compiled->scripting),
    # delete, insert, in-place content update
    t.merge_batch(_mk_actions(spark, [
        ("r1", "b.go", c(2), 0, "upsert", "python", "bb22", "s5"),
        ("r1", "c.rs", c(2), 1, "delete", None, None, None),
        ("r1", "e.rs", c(2), 2, "upsert", "rust", "eee", "s6"),
        ("r1", "a.py", c(2), 3, "upsert", "python", "aaaaaaaa", "s7"),
    ]), epoch=1)
    r = view.refresh()
    assert r["mode"] == "incremental"
    got = {r2["tier"]: (r2["n"], r2["b"]) for r2 in view.read().collect()}
    assert got == _dim_oracle(t, spark, dim_path, "tier")


def test_dim_change_forces_full_rebuild(spark, warehouse, tmp_path):
    t = LakeTable.create(spark, os.path.join(warehouse, "dimc"),
                         num_buckets=4, merge_mode="cow")
    dim_path = str(tmp_path / "dimc")
    _mk_dim(spark, dim_path, [("python", "t1"), ("go", "t2")])
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "aa", "s1"),
        ("r1", "b.go", c(1), 1, "upsert", "go", "bbb", "s2"),
    ]), epoch=0)
    view = IncrementalView(
        spark, t, str(tmp_path / "dvc"), group_cols=["tier"],
        metrics={"n": "1", "b": "length(content)"},
        dim_path=dim_path, dim_on=["lang"])
    view.refresh()
    # rewrite the dimension: python re-maps t1 -> t9. Incremental merge
    # against the old enrichment would be silently wrong; the fingerprint
    # forces a rebuild even though the lake itself did not change.
    _mk_dim(spark, dim_path, [("python", "t9"), ("go", "t2")])
    r = view.refresh()
    assert r["mode"] == "full" and r["reason"] == "dim_changed"
    got = {row["tier"]: (row["n"], row["b"])
           for row in view.read().collect()}
    assert got == _dim_oracle(t, spark, dim_path, "tier")
    assert "t9" in got and "t1" not in got
    # and with the dim stable again, lake churn goes back to incremental
    t.merge_batch(_mk_actions(spark, [
        ("r1", "c.go", c(2), 0, "upsert", "go", "cc", "s3"),
    ]), epoch=1)
    r = view.refresh()
    assert r["mode"] == "incremental"
    got = {row["tier"]: (row["n"], row["b"])
           for row in view.read().collect()}
    assert got == _dim_oracle(t, spark, dim_path, "tier")


def test_dim_enriched_extrema_recompute_scans_enriched(
        spark, warehouse, tmp_path):
    """Extrema retraction rescan must re-join the live scan to the dim —
    a recompute over un-enriched rows would group by a missing column."""
    t = LakeTable.create(spark, os.path.join(warehouse, "dime"),
                         num_buckets=4, merge_mode="mor")
    dim_path = str(tmp_path / "dime")
    _mk_dim(spark, dim_path, [("python", "t1"), ("go", "t1"),
                              ("rust", "t2")])
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "a" * 9, "s1"),
        ("r1", "b.go", c(1), 1, "upsert", "go", "b" * 5, "s2"),
        ("r1", "c.rs", c(1), 2, "upsert", "rust", "c" * 3, "s3"),
    ]), epoch=0)
    view = IncrementalView(
        spark, t, str(tmp_path / "dve"), group_cols=["tier"],
        metrics={"n": "1"},
        extrema={"max_b": ("max", "length(content)")},
        dim_path=dim_path, dim_on=["lang"],
        ext_buffer_k=1)  # drain on first retraction -> rescan path
    view.refresh()
    # delete the t1 max holder -> retraction ties the stored extremum ->
    # group-pruned live rescan, which must see tier via the dim join
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(2), 0, "delete", None, None, None),
    ]), epoch=1)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert r["ext_recomputed_groups"] >= 1
    got = {row["tier"]: (row["n"], row["max_b"])
           for row in view.read().collect()}
    assert got == {"t1": (1, 5), "t2": (1, 3)}


def test_dim_config_validation(spark, warehouse, tmp_path):
    t = LakeTable.create(spark, os.path.join(warehouse, "dimb"),
                         num_buckets=4, merge_mode="cow")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "aa", "s1"),
    ]), epoch=0)
    with pytest.raises(ValueError, match="together"):
        IncrementalView(spark, t, str(tmp_path / "x1"), group_cols=["lang"],
                        metrics={"n": "1"}, dim_path=str(tmp_path / "d"))
    # duplicate dim keys would multiply fact rows
    dup = str(tmp_path / "dup")
    _mk_dim(spark, dup, [("python", "t1"), ("python", "t2")])
    v = IncrementalView(spark, t, str(tmp_path / "x2"), group_cols=["tier"],
                        metrics={"n": "1"}, dim_path=dup, dim_on=["lang"])
    with pytest.raises(ValueError, match="unique"):
        v.refresh()
    # non-key dim column shadowing a fact column would bind ambiguously
    clash = str(tmp_path / "clash")
    _mk_dim(spark, clash, [("python", "x")],
            schema="lang string, content string")
    v2 = IncrementalView(spark, t, str(tmp_path / "x3"),
                         group_cols=["content"], metrics={"n": "1"},
                         dim_path=clash, dim_on=["lang"])
    with pytest.raises(ValueError, match="collide"):
        v2.refresh()


# -------------------------------------------------- distinct-count views

def _distinct_oracle(t: LakeTable, group: str) -> dict:
    """COUNT(DISTINCT lang), COUNT(DISTINCT file extension) per group,
    recomputed from scratch on the live table."""
    ext = F.substring_index(F.col("path"), ".", -1)
    return {
        r[group]: (r["n"], r["n_langs"], r["n_exts"])
        for r in t.read()
        .groupBy(group)
        .agg(F.count(F.lit(1)).alias("n"),
             F.countDistinct("lang").alias("n_langs"),
             F.countDistinct(ext).alias("n_exts"))
        .collect()
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_distinct_ivm_matches_oracle_under_churn(spark, warehouse,
                                                 tmp_path, mode):
    """Exact COUNT DISTINCT maintenance through inserts, deletes that
    retract the last occurrence of a value, updates that move a row
    between values, and null values (ignored per SQL semantics)."""
    t = LakeTable.create(spark, os.path.join(warehouse, f"dist_{mode}"),
                         num_buckets=4, merge_mode=mode)
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "aa", "s1"),
        ("r1", "b.py", c(1), 1, "upsert", "python", "bb", "s2"),
        ("r1", "c.go", c(1), 2, "upsert", "go", "cc", "s3"),
        ("r2", "d.rs", c(1), 3, "upsert", "rust", "dd", "s4"),
        ("r2", "e.rs", c(1), 4, "upsert", None, "ee", "s5"),  # null lang
    ]), epoch=0)
    view = IncrementalView(
        spark, t, str(tmp_path / f"dv_{mode}"), group_cols=["repo"],
        metrics={"n": "1"},
        distinct={"n_langs": "lang",
                  "n_exts": "substring_index(path, '.', -1)"})
    assert view.refresh()["mode"] == "full"
    assert ({r["repo"]: (r["n"], r["n_langs"], r["n_exts"])
             for r in view.read().collect()}
            == _distinct_oracle(t, "repo"))

    # churn 1: delete the ONLY go row (n_langs must drop), add a new ext
    t.merge_batch(_mk_actions(spark, [
        ("r1", "c.go", c(2), 0, "delete", None, None, None),
        ("r1", "f.md", c(2), 1, "upsert", "md", "ff", "s6"),
    ]), epoch=1)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert ({r2["repo"]: (r2["n"], r2["n_langs"], r2["n_exts"])
             for r2 in view.read().collect()}
            == _distinct_oracle(t, "repo"))

    # churn 2: update moves a row python->go (python still supported by
    # a.py), then delete a.py too (python support hits zero); null lang
    # row gains a lang (null was never counted)
    t.merge_batch(_mk_actions(spark, [
        ("r1", "b.py", c(3), 0, "upsert", "go", "bb2", "s7"),
        ("r1", "a.py", c(3), 1, "delete", None, None, None),
        ("r2", "e.rs", c(3), 2, "upsert", "zig", "ee2", "s8"),
    ]), epoch=2)
    assert view.refresh()["mode"] == "incremental"
    assert ({r2["repo"]: (r2["n"], r2["n_langs"], r2["n_exts"])
             for r2 in view.read().collect()}
            == _distinct_oracle(t, "repo"))

    # churn 3: a resolved rename (delete + insert pair, the shape the
    # stream layer hands merge_batch) — ext moves .rs -> .py within r2
    t.merge_batch(_mk_actions(spark, [
        ("r2", "d.rs", c(4), 0, "delete", None, None, None),
        ("r2", "d2.py", c(4), 1, "upsert", "rust", "dd", "s9"),
    ]), epoch=3)
    assert view.refresh()["mode"] == "incremental"
    assert ({r2["repo"]: (r2["n"], r2["n_langs"], r2["n_exts"])
             for r2 in view.read().collect()}
            == _distinct_oracle(t, "repo"))
    # exactly one aux dir retained
    auxes = [fn for fn in os.listdir(str(tmp_path / f"dv_{mode}"))
             if fn.startswith("aux-")]
    assert len(auxes) == 1


def test_distinct_config_change_forces_rebuild(spark, warehouse, tmp_path):
    t = LakeTable.create(spark, os.path.join(warehouse, "distcfg"),
                         num_buckets=4, merge_mode="mor")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "aa", "s1"),
    ]), epoch=0)
    p = str(tmp_path / "v")
    IncrementalView(spark, t, p, group_cols=["repo"],
                    metrics={"n": "1"}).refresh()
    t.merge_batch(_mk_actions(spark, [
        ("r1", "b.go", c(2), 0, "upsert", "go", "bb", "s2"),
    ]), epoch=1)
    v2 = IncrementalView(spark, t, p, group_cols=["repo"],
                         metrics={"n": "1"}, distinct={"n_langs": "lang"})
    r = v2.refresh()
    assert r["mode"] == "full" and r["reason"] == "config_changed"
    got = {row["repo"]: (row["n"], row["n_langs"])
           for row in v2.read().collect()}
    assert got == {"r1": (2, 2)}
    # name collision with a metric is rejected up front
    with pytest.raises(ValueError, match="collides"):
        IncrementalView(spark, t, str(tmp_path / "x"), group_cols=["repo"],
                        metrics={"n": "1"}, distinct={"n": "lang"})


def test_distinct_over_dim_attribute(spark, warehouse, tmp_path):
    """distinct may reference a dimension attribute (enrichment happens
    before the aux delta); unmatched fact rows land in the null group
    whose distinct counts still maintain exactly."""
    t = LakeTable.create(spark, os.path.join(warehouse, "distdim"),
                         num_buckets=4, merge_mode="mor")
    dim_path = str(tmp_path / "dim")
    _mk_dim(spark, dim_path, [("python", "scripting"), ("go", "compiled"),
                              ("rust", "compiled")])
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "aa", "s1"),
        ("r1", "b.go", c(1), 1, "upsert", "go", "bb", "s2"),
        ("r2", "c.rs", c(1), 2, "upsert", "rust", "cc", "s3"),
        ("r2", "d.sh", c(1), 3, "upsert", "shell", "dd", "s4"),  # null tier
    ]), epoch=0)
    view = IncrementalView(
        spark, t, str(tmp_path / "v"), group_cols=["repo"],
        metrics={"n": "1"}, distinct={"n_tiers": "tier"},
        dim_path=dim_path, dim_on=["lang"])
    view.refresh()

    def oracle():
        dim = spark.read.parquet(dim_path)
        return {r["repo"]: (r["n"], r["n_tiers"])
                for r in t.read().join(dim, "lang", "left").groupBy("repo")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.countDistinct("tier").alias("n_tiers")).collect()}

    got = {r["repo"]: (r["n"], r["n_tiers"]) for r in view.read().collect()}
    assert got == oracle()
    assert got["r2"] == (2, 1)  # shell has no tier -> not counted
    # delete r1's go row: compiled retracts from r1
    t.merge_batch(_mk_actions(spark, [
        ("r1", "b.go", c(2), 0, "delete", None, None, None),
    ]), epoch=1)
    assert view.refresh()["mode"] == "incremental"
    got = {r["repo"]: (r["n"], r["n_tiers"]) for r in view.read().collect()}
    assert got == oracle()
    assert got["r1"] == (1, 1)


def test_extrema_retraction_in_null_keyed_group(spark, warehouse, tmp_path):
    """A null group key (here: null lang) must still be rescanned when its
    extremum retracts — equality joins would silently keep the stale
    folded value (null never equals null); the recompute path joins
    null-safe."""
    t = LakeTable.create(spark, os.path.join(warehouse, "nullg"),
                         num_buckets=4, merge_mode="mor")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a", c(1), 0, "upsert", None, "x" * 9, "s1"),  # null lang max
        ("r1", "b", c(1), 1, "upsert", None, "x" * 4, "s2"),
        ("r1", "c", c(1), 2, "upsert", "go", "x" * 7, "s3"),
    ]), epoch=0)
    view = IncrementalView(
        spark, t, str(tmp_path / "v"), group_cols=["lang"],
        metrics={"n": "1"},
        extrema={"max_b": ("max", "length(content)")},
        ext_buffer_k=1)  # drain on first retraction -> rescan path
    view.refresh()
    # delete the null-group's max holder -> retraction must rescan the
    # null group and shrink max_b 9 -> 4
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a", c(2), 0, "delete", None, None, None),
    ]), epoch=1)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert r["ext_recomputed_groups"] >= 1
    got = {row["lang"]: (row["n"], row["max_b"])
           for row in view.read().collect()}
    assert got == {None: (1, 4), "go": (1, 7)}


def test_view_maintained_continuously_during_stream(spark, tmp_path):
    """Close the loop CDC-in -> lake -> incrementally-maintained view: a
    run_stream on_batch hook refreshes a view carrying all three
    maintenance families (signed metrics, extrema, distinct) after every
    epoch; each refresh must match a from-scratch aggregation of the lake
    at that instant, and steady-state refreshes must be incremental."""
    from skipmap_processor_spark.sources.events import (
        base_spark_schema,
        generate_full,
        write_event_log,
    )
    from skipmap_processor_spark.streaming.pipeline import (
        bootstrap_base,
        run_stream,
    )

    base, ev, ddl = generate_full(n_repos=8, n_base_paths=60, n_events=400,
                                  n_epochs=4)
    events_dir = str(tmp_path / "events")
    write_event_log(events_dir, ev, ddl)
    lake = LakeTable.create(spark, str(tmp_path / "lake"), num_buckets=8,
                            merge_mode="mor")
    bootstrap_base(
        lake, spark.createDataFrame(base, schema=base_spark_schema()))
    # the fixture's DDL renames lang -> language mid-stream; a view must
    # reference rename-stable columns (an expression naming a renamed
    # column would bind on only one side of the rename epoch)
    view = IncrementalView(
        spark, lake, str(tmp_path / "view"), group_cols=["repo"],
        metrics={"n": "1", "b": "length(content)"},
        extrema={"mx": ("max", "length(content)")},
        distinct={"ne": "substring_index(path, '.', -1)"})
    assert view.refresh()["mode"] == "full"

    checks: list[tuple[int, str, bool]] = []

    def on_batch(stats):
        r = view.refresh()
        got = {row["repo"]: (row["n"], row["b"], row["mx"], row["ne"])
               for row in view.read().collect()}
        ext = F.substring_index(F.col("path"), ".", -1)
        want = {row["repo"]: (row["n"], row["b"], row["mx"], row["ne"])
                for row in lake.read().groupBy("repo").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.length("content")).alias("b"),
                    F.max(F.length("content")).alias("mx"),
                    F.countDistinct(ext).alias("ne")).collect()}
        checks.append((stats.get("epoch"), r["mode"], got == want))

    run_stream(spark, lake, events_dir, str(tmp_path / "ckpt"),
               available_now=True, on_batch=on_batch).awaitTermination()
    assert len(checks) >= 4
    bad = [c for c in checks if not c[2]]
    assert not bad, f"view diverged from oracle at epochs {bad}"
    assert any(m == "incremental" for _, m, _ in checks)


def test_sum_zero_identity_on_full_retraction(spark, warehouse, tmp_path):
    """The engine's SUM carries a zero identity in BOTH paths: a group
    whose non-null metric values were all retracted reports 0 (never a
    0-vs-NULL divergence between incremental state and a fresh rebuild —
    the code-review finding this test pins)."""
    t = LakeTable.create(spark, os.path.join(warehouse, "sumz"),
                         num_buckets=4, merge_mode="mor")
    # b sums length(lang): one non-null contributor + one null
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "aa", "s1"),
        ("r1", "b.py", c(1), 1, "upsert", None, "bb", "s2"),
    ]), epoch=0)
    view = IncrementalView(
        spark, t, str(tmp_path / "v"), group_cols=["repo"],
        metrics={"n": "1", "b": "length(lang)"})
    view.refresh()
    assert {(r["repo"], r["n"], r["b"]) for r in view.read().collect()} \
        == {("r1", 2, 6)}
    # retract the only non-null contributor; the group survives via b.py
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(2), 0, "delete", None, None, None),
    ]), epoch=1)
    assert view.refresh()["mode"] == "incremental"
    got = {(r["repo"], r["n"], r["b"]) for r in view.read().collect()}
    assert got == {("r1", 1, 0)}
    # a from-scratch rebuild agrees (same zero identity, no divergence)
    twin = IncrementalView(
        spark, t, str(tmp_path / "v2"), group_cols=["repo"],
        metrics={"n": "1", "b": "length(lang)"})
    twin.refresh()
    assert {(r["repo"], r["n"], r["b"]) for r in twin.read().collect()} \
        == got


def test_output_name_group_col_collision_rejected(spark, warehouse,
                                                  tmp_path):
    t = LakeTable.create(spark, os.path.join(warehouse, "clash"),
                         num_buckets=4)
    for kw in ({"metrics": {"repo": "1"}},
               {"metrics": {"n": "1"}, "extrema": {"repo": ("max", "1")}},
               {"metrics": {"n": "1"}, "distinct": {"repo": "lang"}}):
        with pytest.raises(ValueError, match="collide"):
            IncrementalView(spark, t, str(tmp_path / "x"),
                            group_cols=["repo"], **kw)
