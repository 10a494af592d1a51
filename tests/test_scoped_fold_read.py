"""The MOR read's LWW fold is scoped to multi-file buckets (a bucket
with one file cannot hold two versions of a key). These tests pin the
split read against a manual table-wide fold — byte-for-byte the same
rows, in every scoping combination."""
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from skipmap_processor_spark.lake import KEY_COLS, LakeTable


@pytest.fixture(scope="module")
def spark():
    from skipmap_processor_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4,
                  driver_memory="4g", app_name="test-scoped-fold")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _mk_lake(spark, tmp, n_base=500, nb=64):
    lake = LakeTable.create(spark, os.path.join(tmp, "lake"),
                            num_buckets=nb, merge_mode="mor")
    base = spark.range(n_base).select(
        F.concat(F.lit("repo-"), (F.col("id") % 7).cast("string"))
        .alias("repo"),
        F.concat(F.lit("src/f"), F.col("id").cast("string"),
                 F.lit(".py")).alias("path"),
        F.lpad(F.hex(F.col("id")), 40, "0").alias("commit"),
        F.col("id").alias("event_seq"),
        F.lit("upsert").alias("op"),
        F.lit("python").alias("lang"),
        F.repeat(F.lit("x"), ((F.col("id") % 9) + 1).cast("int"))
        .alias("content"),
        F.lpad(F.hex(F.xxhash64(F.col("id"))), 64, "0")
        .alias("content_sha"),
    )
    lake.merge_batch(base, epoch=0)
    # delta: update a few keys (multi-file buckets), delete one, insert a
    # brand-new key — touches a handful of the 64 buckets
    delta = spark.createDataFrame(
        [("repo-1", "src/f8.py", "f" * 40, 10**9, "upsert", "go",
          "updated", "a" * 64),
         ("repo-2", "src/f9.py", "f" * 39 + "e", 10**9 + 1, "delete",
          "python", "", "b" * 64),
         ("repo-9", "src/new.py", "f" * 39 + "d", 10**9 + 2, "upsert",
          "rust", "fresh", "c" * 64)],
        "repo string, path string, commit string, event_seq bigint, "
        "op string, lang string, content string, content_sha string",
    )
    lake.merge_batch(delta, epoch=1)
    assert lake.manifest()["properties"].get("has_deltas")
    return lake


def _manual_fold(lake, **kw):
    """Table-wide fold over the same snapshot: read every file with the
    window applied to ALL rows (the pre-split semantics)."""
    mani = lake.manifest()
    files = lake.file_entries(mani)
    df = lake._read_files(mani, files)
    w = Window.partitionBy(*KEY_COLS).orderBy(
        F.col("commit").desc(), F.col("event_seq").desc(),
        F.col("_epoch").desc())
    df = (df.withColumn("_rn", F.row_number().over(w))
          .filter(F.col("_rn") == 1).drop("_rn"))
    if not kw.get("include_deleted"):
        df = df.filter(~F.col("is_deleted"))
    if not kw.get("with_engine_cols"):
        df = df.drop("is_deleted", "_epoch")
    return df


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_split_read_equals_table_wide_fold(spark, tmp_path):
    lake = _mk_lake(spark, str(tmp_path))
    for kw in ({}, {"include_deleted": True},
               {"include_deleted": True, "with_engine_cols": True}):
        got = _rows(lake.read(**kw))
        want = _rows(_manual_fold(lake, **kw))
        assert got == want, f"split read diverged under {kw}"
    # the new key must be present, the deleted one absent, the update won
    live = {(r["repo"], r["path"]): r["content"]
            for r in lake.read().collect()}
    assert live[("repo-9", "src/new.py")] == "fresh"
    assert live[("repo-1", "src/f8.py")] == "updated"
    assert ("repo-2", "src/f9.py") not in live


def test_split_read_scoped_variants(spark, tmp_path):
    lake = _mk_lake(spark, str(tmp_path))
    # repo-scoped: one changed repo + one untouched repo
    got = _rows(lake.read(repos=["repo-1", "repo-3"]))
    want = _rows(_manual_fold(lake).filter(
        F.col("repo").isin("repo-1", "repo-3")))
    assert got == want
    # path-scoped
    got = _rows(lake.read(paths=["src/f8.py", "src/f123.py"]))
    want = _rows(_manual_fold(lake).filter(
        F.col("path").isin("src/f8.py", "src/f123.py")))
    assert got == want
    # bucket-scoped: every bucket, in two halves, unioned == full table
    nb = int(lake.manifest()["num_buckets"])
    lo = lake.read(buckets=list(range(nb // 2)), include_deleted=True,
                   with_engine_cols=True)
    hi = lake.read(buckets=list(range(nb // 2, nb)), include_deleted=True,
                   with_engine_cols=True)
    got = sorted(_rows(lo) + _rows(hi))
    want = _rows(_manual_fold(lake, include_deleted=True,
                              with_engine_cols=True))
    assert got == want


def test_plan_skips_fold_for_single_file_buckets(spark, tmp_path):
    """The executed plan must show the split: one windowed subtree over
    the multi-file buckets plus a fold-free union branch."""
    lake = _mk_lake(spark, str(tmp_path))
    plan = lake.read()._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" in plan, plan[:2000]
    # exactly one Window operator (the WindowGroupLimit pushdown below it
    # also prints row_number, so count operators, not the function name)
    assert plan.count("Window [") == 1, plan[:2000]
