"""lake_changefeed streaming source: the MOR commit log as a native
Structured Streaming source (Spark 4 Python DataSource API).

Oracle: a MOR merge appends exactly its batch's write images, so the feed
from version 0 must equal the union of everything merged — and LWW-folding
the streamed rows must reproduce ``lake.read()`` exactly (the same
associative fold the lake's own read path applies)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from skipmap_processor_spark.lake import LakeTable
from skipmap_processor_spark.streaming.feed_source import register_feed_source


def _mk_actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, op string, "
        "lang string, content string, content_sha string",
    )


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 24


def _run_feed(spark, table_path, checkpoint, qname, **opts):
    register_feed_source(spark)
    r = spark.readStream.format("lake_changefeed").option("path", table_path)
    for k, v in opts.items():
        r = r.option(k, v)
    q = (r.load().writeStream.format("memory").queryName(qname)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(qname)


def test_feed_emits_write_images_and_folds_to_table_state(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=4,
                         merge_mode="mor")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1"),
        ("r1", "b.py", c(1), 1, "upsert", "py", "b1", "s2"),
    ]), epoch=0)
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(2), 0, "upsert", "go", "v2", "s3"),
        ("r2", "x.py", c(2), 1, "upsert", "py", "x1", "s4"),
    ]), epoch=1)
    t.merge_batch(_mk_actions(spark, [
        ("r1", "b.py", c(3), 0, "delete", None, None, None),
    ]), epoch=2)

    got = _run_feed(spark, t.path, os.path.join(warehouse, "ck1"), "feed1",
                    startingVersion=0)
    rows = got.collect()
    assert len(rows) == 5, "every write image exactly once"
    by_type = {r["_change_type"] for r in rows}
    assert by_type == {"upsert", "delete"}
    assert all(r["_commit_version"] >= 1 for r in rows)
    # versions are distinct per merge commit and ordered with the epochs
    vers = sorted({r["_commit_version"] for r in rows})
    assert len(vers) == 3

    # LWW fold of the stream == table state (associativity oracle)
    w = Window.partitionBy("repo", "path").orderBy(
        F.col("commit").desc(), F.col("event_seq").desc(),
        F.col("_epoch").desc())
    folded = (got.withColumn("_rn", F.row_number().over(w))
              .filter((F.col("_rn") == 1) & (~F.col("is_deleted")))
              .select("repo", "path", "commit", "content"))
    expect = t.read().select("repo", "path", "commit", "content")
    assert sorted(map(tuple, folded.collect())) == \
        sorted(map(tuple, expect.collect()))


def _drain_feed(spark, table_path, checkpoint, sink: list, **opts):
    """One availableNow pass through foreachBatch (memory sink can't
    recover from a checkpoint; foreachBatch can)."""
    register_feed_source(spark)
    r = spark.readStream.format("lake_changefeed").option("path", table_path)
    for k, v in opts.items():
        r = r.option(k, v)
    q = (r.load().writeStream
         .foreachBatch(lambda df, bid: sink.extend(df.collect()))
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def test_feed_tail_resumes_from_checkpoint(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=4,
                         merge_mode="mor")
    t.merge_batch(_mk_actions(
        spark, [("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1")]), epoch=0)
    ck = os.path.join(warehouse, "ck2")
    first: list = []
    _drain_feed(spark, t.path, ck, first, startingVersion=0)
    assert len(first) == 1

    t.merge_batch(_mk_actions(
        spark, [("r1", "a.py", c(2), 0, "upsert", "go", "v2", "s2")]), epoch=1)
    t.merge_batch(_mk_actions(
        spark, [("r2", "b.py", c(3), 0, "upsert", "py", "b1", "s3")]), epoch=2)
    second: list = []  # same checkpoint -> only the two new commits
    _drain_feed(spark, t.path, ck, second, startingVersion=0)
    assert {r["content"] for r in second} == {"v2", "b1"}


def test_feed_skips_compaction_and_metadata_commits(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=2,
                         merge_mode="mor")
    for i in range(3):
        t.merge_batch(_mk_actions(
            spark, [("r1", "a.py", c(i + 1), 0, "upsert", "go", f"v{i}", "s")]),
            epoch=i)
    t.compact()  # folds 3 delta rows to 1 — must NOT re-emit
    t.add_column("extra", "bigint")  # metadata commit — must NOT emit
    t.merge_batch(
        spark.createDataFrame(
            [("r1", "z.py", c(9), 0, "upsert", "go", "z", "s", 7)],
            "repo string, path string, commit string, event_seq bigint, "
            "op string, lang string, content string, content_sha string, "
            "extra bigint"),
        epoch=3)

    got = _run_feed(spark, t.path, os.path.join(warehouse, "ck3"), "feed3",
                    startingVersion=0)
    # 3 merge images + 1 post-compact merge image; the compact fold's file
    # and the DDL commit contribute nothing
    assert got.count() == 4
    # the post-DDL file carries the new column; pre-DDL files read null
    vals = {(r["content"], r["extra"]) for r in got.collect()}
    assert ("z", 7) in vals and ("v0", None) in vals


def test_feed_rebinds_renamed_columns_by_field_id(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=2,
                         merge_mode="mor")
    t.merge_batch(_mk_actions(
        spark, [("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1")]), epoch=0)
    t.rename_column("lang", "language")
    t.merge_batch(
        spark.createDataFrame(
            [("r1", "b.py", c(2), 0, "upsert", "rs", "v2", "s2")],
            "repo string, path string, commit string, event_seq bigint, "
            "op string, language string, content string, content_sha string"),
        epoch=1)

    got = _run_feed(spark, t.path, os.path.join(warehouse, "ck4"), "feed4",
                    startingVersion=0)
    rows = {(r["language"], r["content"]) for r in got.collect()}
    assert rows == {("go", "v1"), ("rs", "v2")}, \
        "old files must rebind lang -> language by field id"


def test_feed_max_versions_per_batch_splits_catchup(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=2,
                         merge_mode="mor")
    for i in range(4):
        t.merge_batch(_mk_actions(
            spark, [("r1", f"f{i}.py", c(i + 1), 0, "upsert", "go", f"v{i}", "s")]),
            epoch=i)
    register_feed_source(spark)
    seen_batches = []
    # a live trigger (the Python source's availableNow falls back to one
    # batch): the cap makes catch-up advance one version per micro-batch
    q = (spark.readStream.format("lake_changefeed")
         .option("path", t.path).option("startingVersion", 0)
         .option("maxVersionsPerBatch", 1).load()
         .writeStream.foreachBatch(
             lambda df, bid: seen_batches.append(df.count()))
         .option("checkpointLocation", os.path.join(warehouse, "ck5"))
         .trigger(processingTime="1 second").start())
    import time

    deadline = time.time() + 90
    while sum(seen_batches) < 4 and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    assert sum(seen_batches) == 4
    assert len([n for n in seen_batches if n]) == 4, \
        "1-version cap -> one merge commit per micro-batch"


def test_feed_rejects_cow_tables(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=2,
                         merge_mode="cow")
    t.merge_batch(_mk_actions(
        spark, [("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1")]), epoch=0)
    register_feed_source(spark)
    with pytest.raises(Exception, match="(?i)mor|cow"):
        q = (spark.readStream.format("lake_changefeed")
             .option("path", t.path).option("startingVersion", 0).load()
             .writeStream.format("memory").queryName("feed_cow")
             .option("checkpointLocation", os.path.join(warehouse, "ck6"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
