"""Bucket-spec evolution (rescale_buckets): lazy Iceberg-style migration.

Twin-oracle strategy: the same action stream is applied to a table that
rescales mid-stream and to a never-rescaled twin; final states must be
row-identical. On top: cross-spec prune exactness, bucket-scoped read
post-filtering, CoW migration-on-touch, compact() as the migration path,
and the change feed across a rescale boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from skipmap_processor_spark.changefeed import table_changes
from skipmap_processor_spark.lake import LakeTable, _spec_prune, bucket_expr

import pytest


def _mk_actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, "
        "op string, lang string, content string, content_sha string",
    )


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 24


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _epochs(n_keys: int = 24):
    """Six small epochs: inserts, updates, deletes, reinserts — keys spread
    across many buckets under both specs."""
    keys = [("r%d" % (i % 3), "f%02d.py" % i) for i in range(n_keys)]
    eps = []
    eps.append([(r, p, c(1), i, "upsert", "go", "v1", "s1")
                for i, (r, p) in enumerate(keys)])
    eps.append([(r, p, c(2), i, "upsert", "go", "v2", "s2")
                for i, (r, p) in enumerate(keys) if i % 3 == 0])
    eps.append([(r, p, c(3), i, "delete", None, None, None)
                for i, (r, p) in enumerate(keys) if i % 4 == 1])
    # post-rescale epochs: updates of old keys, brand-new keys, a reinsert
    eps.append([(r, p, c(4), i, "upsert", "py", "v4", "s4")
                for i, (r, p) in enumerate(keys) if i % 2 == 0])
    eps.append([("new", "n%02d.rs" % i, c(5), i, "upsert", "rs", "v5", "s5")
                for i in range(8)])
    eps.append([(r, p, c(6), i, "upsert", "go", "v6", "s6")
                for i, (r, p) in enumerate(keys) if i % 4 == 1][:3])
    return eps


def _drive(spark, path, mode, rescales, nb0=4):
    """Apply the 6 epochs, running `rescales[e] = new_nb` before epoch e."""
    t = LakeTable.create(spark, path, num_buckets=nb0, merge_mode=mode)
    for e, rows in enumerate(_epochs()):
        if e in rescales:
            t.rescale_buckets(rescales[e])
        t.merge_batch(_mk_actions(spark, rows), epoch=e)
    return t


def test_rescale_validation(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=4)
    assert t.rescale_buckets(4) == {"rescaled": False, "num_buckets": 4}
    with pytest.raises(ValueError):
        t.rescale_buckets(6)   # not a multiple
    with pytest.raises(ValueError):
        t.rescale_buckets(2)   # shrink
    r = t.rescale_buckets(8)
    assert r["rescaled"] and r["num_buckets"] == 8
    assert int(t.manifest()["num_buckets"]) == 8
    # chain bookkeeping
    hist = t.manifest()["properties"]["bucket_spec_history"]
    assert [h["nb"] for h in hist] == [4]


def test_mor_rescale_twin_oracle(spark, warehouse):
    a = _drive(spark, os.path.join(warehouse, "a"), "mor", {3: 8})
    b = _drive(spark, os.path.join(warehouse, "b"), "mor", {})
    assert _rows(a.read()) == _rows(b.read())
    assert _rows(a.read(include_deleted=True, with_engine_cols=True)) == \
        _rows(b.read(include_deleted=True, with_engine_cols=True))
    # mixed specs present and flagged
    specs = a._live_specs(a.manifest())
    assert specs == {4, 8}
    assert a.manifest()["properties"]["has_deltas"] is True
    # new shards are stamped with the spec they bucketed under
    nbs = {int(sd.get("nb", -1)) for sd in a.manifest()["shards"]}
    assert nbs == {4, 8}


def test_rescale_chain_twin_oracle(spark, warehouse):
    a = _drive(spark, os.path.join(warehouse, "a"), "mor", {2: 8, 4: 16})
    b = _drive(spark, os.path.join(warehouse, "b"), "mor", {})
    assert _rows(a.read()) == _rows(b.read())
    assert a._live_specs(a.manifest()) == {4, 8, 16}


def test_cow_rescale_twin_oracle(spark, warehouse):
    a = _drive(spark, os.path.join(warehouse, "a"), "cow", {3: 8})
    b = _drive(spark, os.path.join(warehouse, "b"), "cow", {})
    assert _rows(a.read()) == _rows(b.read())
    # CoW invariant holds across the flip: one live row per key, no LWW
    # window needed
    live = a.read(include_deleted=True, with_engine_cols=True)
    assert live.groupBy("repo", "path").count().filter("count > 1").count() == 0
    assert a.manifest()["properties"].get("has_deltas") in (False, None)
    # merges after the rescale migrate the files they touch: every key the
    # post-rescale epochs touched now lives in a current-spec file
    mani = a.manifest()
    legacy = [fe for fe in a.file_entries(mani) if fe["nb"] != 8]
    legacy_rows = a._read_files(mani, legacy)
    touched = {("r0", "f00.py"), ("new", "n00.rs")}  # epoch-3/4 keys
    got = {(r["repo"], r["path"]) for r in legacy_rows.collect()}
    assert not (touched & got)


def test_bucket_scoped_read_exact_across_specs(spark, warehouse):
    a = _drive(spark, os.path.join(warehouse, "a"), "mor", {3: 8})
    nb = int(a.manifest()["num_buckets"])
    full = a.read(with_engine_cols=True).withColumn("_b", bucket_expr(nb))
    for bkt in range(nb):
        want = _rows(full.filter(F.col("_b") == bkt).drop("_b"))
        got = _rows(a.read(buckets=[bkt], with_engine_cols=True))
        assert got == want, f"bucket {bkt} scoped read diverges"


def test_lookup_pruned_across_specs(spark, warehouse):
    a = _drive(spark, os.path.join(warehouse, "a"), "mor", {3: 8})
    # one pre-rescale key (updated post-rescale), one deleted, one new
    keys = spark.createDataFrame(
        [("r0", "f00.py"), ("r1", "f01.py"), ("new", "n03.rs")],
        "repo string, path string")
    got = {(r["repo"], r["path"], r["content"], bool(r["is_deleted"]))
           for r in a.lookup(keys).collect()}
    assert ("r0", "f00.py", "v4", False) in got   # post-rescale update
    # deleted in epoch 2 (i%4==1), reinserted by epoch 5's first-3 slice
    assert ("r1", "f01.py", "v6", False) in got
    assert ("new", "n03.rs", "v5", False) in got
    assert len(got) == 3


def test_compact_migrates_to_current_spec(spark, warehouse):
    a = _drive(spark, os.path.join(warehouse, "a"), "mor", {3: 8})
    b = _drive(spark, os.path.join(warehouse, "b"), "mor", {})
    before = _rows(a.read())
    a.compact()
    mani = a.manifest()
    assert a._live_specs(mani) == {8}
    assert mani["properties"]["has_deltas"] is False
    assert _rows(a.read()) == before == _rows(b.read())
    # prune exactness after migration too
    nb = 8
    full = a.read(with_engine_cols=True).withColumn("_b", bucket_expr(nb))
    for bkt in (0, 3, 7):
        assert _rows(a.read(buckets=[bkt], with_engine_cols=True)) == \
            _rows(full.filter(F.col("_b") == bkt).drop("_b"))


def test_file_entries_cross_spec_prune_is_exact(spark, warehouse):
    """Descriptor pruning may never miss a file holding a requested key."""
    a = _drive(spark, os.path.join(warehouse, "a"), "mor", {3: 8})
    mani = a.manifest()
    all_entries = a.file_entries(mani)
    for bkt in range(8):
        pruned = {fe["path"] for fe in a.file_entries(mani, buckets=[bkt])}
        # brute force: a file can hold bucket-bkt keys iff its own bucket id
        # equals bkt reduced into its spec space
        for fe in all_entries:
            need = _spec_prune(fe["nb"], 8, {bkt})
            if int(fe["bucket"]) in need:
                assert fe["path"] in pruned, (bkt, fe)


def test_changefeed_across_rescale(spark, warehouse):
    a = _drive(spark, os.path.join(warehouse, "a"), "mor", {3: 8})
    # find the rescale (metadata) version: changes across it alone are empty
    manis = [a.manifest(v) for v in range(int(a.manifest()["version"]) + 1)]
    meta_vs = [m["version"] for m in manis if m["commit_kind"] == "metadata"]
    assert meta_vs, "rescale commit missing"
    v = meta_vs[0]
    assert table_changes(a, v - 1, v).count() == 0
    # a feed window straddling the rescale sees exactly the post-rescale
    # epochs' net effect: replaying it onto the pre-window state converges
    feed = table_changes(a, v - 1, int(a.manifest()["version"]))
    n_updates = feed.filter(F.col("_change_type").isin(
        "insert", "update_postimage", "delete")).count()
    assert n_updates > 0
    # every key epochs 3-5 touched appears in the feed
    touched = {("r0", "f00.py"), ("new", "n00.rs")}
    got = {(r["repo"], r["path"]) for r in feed.collect()}
    assert touched <= got


def test_rescale_empty_table_then_write(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=2,
                         merge_mode="mor")
    t.rescale_buckets(8)
    t.merge_batch(_mk_actions(
        spark, [("r", "p", c(1), 0, "upsert", "go", "v1", "s")]), epoch=0)
    assert t._live_specs(t.manifest()) == {8}
    assert _rows(t.read().select("repo", "path", "content")) == [
        ("r", "p", "v1")]
