"""table_changes' empty-pre shortcut: when every historical file is
pruned away (changed repos are brand new), the feed must be exactly the
insert-classified post image — net semantics included (a key created
and deleted inside the range emits nothing)."""
import os

import pytest
from pyspark.sql import functions as F

from skipmap_processor_spark.changefeed import table_changes
from skipmap_processor_spark.lake import LakeTable


@pytest.fixture(scope="module")
def spark():
    from skipmap_processor_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4,
                  driver_memory="4g", app_name="test-feed-empty-pre")
    s.sparkContext.setLogLevel("ERROR")
    yield s


SCHEMA = ("repo string, path string, commit string, event_seq bigint, "
          "op string, lang string, content string, content_sha string")


def test_new_repo_feed_is_insert_only_and_net(spark, tmp_path):
    lake = LakeTable.create(spark, os.path.join(str(tmp_path), "lake"),
                            num_buckets=16, merge_mode="mor")
    base = spark.createDataFrame(
        [("old-repo", f"src/b{i}.py", f"{i:040x}", i, "upsert", "python",
          "base", "0" * 64) for i in range(50)], SCHEMA)
    lake.merge_batch(base, epoch=0)
    v0 = lake._latest_version()

    # trickle commits touching ONLY a brand-new repo: k1 inserted then
    # updated (net: one insert at the latest value), k2 inserted, k3
    # inserted then deleted (net: nothing)
    rows = [
        ("repo-new", "k1.py", "a" * 39 + "1", 100, "upsert", "go", "v1",
         "1" * 64),
        ("repo-new", "k2.py", "a" * 39 + "2", 101, "upsert", "go", "v2",
         "2" * 64),
        ("repo-new", "k3.py", "a" * 39 + "3", 102, "upsert", "go", "v3",
         "3" * 64),
        ("repo-new", "k1.py", "b" * 39 + "4", 103, "upsert", "rust",
         "v1-updated", "4" * 64),
        ("repo-new", "k3.py", "b" * 39 + "5", 104, "delete", "go", "",
         "5" * 64),
    ]
    for i, r in enumerate(rows, start=1):
        lake.merge_batch(spark.createDataFrame([r], SCHEMA), epoch=i)

    feed = table_changes(lake, v0, lake._latest_version())
    got = {(r["repo"], r["path"]):
           (r["_change_type"], r["content"], r["commit"])
           for r in feed.collect()}
    assert got == {
        ("repo-new", "k1.py"): ("insert", "v1-updated", "b" * 39 + "4"),
        ("repo-new", "k2.py"): ("insert", "v2", "a" * 39 + "2"),
    }
    # schema contract identical to the join path
    assert feed.columns == [
        "repo", "path", "lang", "content", "content_sha", "commit",
        "event_seq", "_change_type"]


def test_mixed_feed_still_classifies_updates(spark, tmp_path):
    """Same shape but the range also touches the pre-existing repo — the
    join path must still emit update pre/post pairs."""
    lake = LakeTable.create(spark, os.path.join(str(tmp_path), "lake"),
                            num_buckets=16, merge_mode="mor")
    base = spark.createDataFrame(
        [("old-repo", "src/b0.py", "0" * 40, 0, "upsert", "python",
          "base", "0" * 64)], SCHEMA)
    lake.merge_batch(base, epoch=0)
    v0 = lake._latest_version()
    lake.merge_batch(spark.createDataFrame(
        [("old-repo", "src/b0.py", "c" * 40, 200, "upsert", "python",
          "changed", "6" * 64),
         ("repo-new", "k9.py", "d" * 40, 201, "upsert", "go", "fresh",
          "7" * 64)], SCHEMA), epoch=1)
    feed = table_changes(lake, v0, lake._latest_version())
    got = sorted((r["_change_type"], r["repo"], r["path"], r["content"])
                 for r in feed.collect())
    assert got == [
        ("insert", "repo-new", "k9.py", "fresh"),
        ("update_postimage", "old-repo", "src/b0.py", "changed"),
        ("update_preimage", "old-repo", "src/b0.py", "base"),
    ]
