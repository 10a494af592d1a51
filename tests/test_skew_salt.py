"""Skew + salting: invariance of results, balance of work (SURVEY §7.1 #9)."""

from __future__ import annotations

import os

import pandas as pd

from skipmap_processor_spark.lake import LakeTable
from skipmap_processor_spark.operators.dedup import lww_dedup, salted_repartition
from skipmap_processor_spark.sources.events import generate_bulk
from skipmap_processor_spark.streaming.pipeline import replay_log


def _bulk_df(spark, n_keys=4000, n_events=40000, n_epochs=2):
    _, ev, _ = generate_bulk(n_keys=n_keys, n_events=n_events, n_epochs=n_epochs)
    ev = ev.copy()
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    return spark.createDataFrame(ev), ev


def test_lww_dedup_salt_invariance(spark):
    """Two-phase salted dedup must equal the single-phase result exactly."""
    df, _ = _bulk_df(spark)
    df = df.drop("epoch")
    a = lww_dedup(df, salt_buckets=1).select("repo", "path", "commit").toPandas()
    b = lww_dedup(df, salt_buckets=8).select("repo", "path", "commit").toPandas()
    a = a.sort_values(["repo", "path"]).reset_index(drop=True)
    b = b.sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_salted_repartition_balances_hot_repo(spark):
    """One repo holds >=35% of rows; salted repartition must spread it so no
    partition exceeds ~2x the mean row count."""
    df, ev = _bulk_df(spark, n_keys=2000, n_events=40000)
    hot_share = (ev["repo"] == ev["repo"].mode()[0]).mean()
    assert hot_share >= 0.3, "fixture must actually be skewed"
    n_parts = 16
    out = salted_repartition(df, n_parts, key="repo", salt=16)
    from pyspark.sql import functions as F

    sizes = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .toPandas()["count"]
    )
    assert sizes.max() <= 2.5 * sizes.mean(), (
        f"straggler partition: max={sizes.max()} mean={sizes.mean():.0f}"
    )


def test_bucket_distribution_under_skew(spark, warehouse):
    """Hot-repo events spread across buckets because bucketing hashes
    (repo, path): the ledger's per-bucket rows must stay balanced."""
    df, _ = _bulk_df(spark, n_keys=3000, n_events=30000, n_epochs=2)
    lake = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=8,
                            merge_mode="mor")
    replay_log(spark, lake, df)
    led = lake.read_ledger().toPandas()
    per_bucket = led.groupby("bucket")["rows"].sum()
    assert per_bucket.max() <= 2 * per_bucket.median(), (
        f"bucket skew: {per_bucket.to_dict()}"
    )


def test_bulk_fast_path_equals_duckdb_oracle(spark, warehouse):
    """Rename-free bulk replay (the single-exchange fast path) must equal a
    DuckDB window-LWW oracle over the same event set."""
    import duckdb

    df, ev = _bulk_df(spark, n_keys=3000, n_events=30000, n_epochs=3)
    lake = LakeTable.create(spark, os.path.join(warehouse, "t2"), num_buckets=8,
                            merge_mode="mor")
    stats = replay_log(spark, lake, df)
    assert all(not s["skipped"] for s in stats)
    engine = (
        lake.read()
        .select("repo", "path", "commit", "content")
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ev", ev)
    oracle = con.execute(
        """
        SELECT repo, path, commit, content FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path
                     ORDER BY commit DESC, event_seq DESC) AS rn
          FROM ev
        ) WHERE rn = 1 AND op != 'delete'
        ORDER BY repo, path
        """
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(engine, oracle)


def test_rename_components(spark):
    from skipmap_processor_spark.operators.dedup import rename_components

    renames = spark.createDataFrame(
        [
            ("r1", "a", "b"), ("r1", "b", "c"),          # chain a-b-c
            ("r1", "x", "y"),                              # separate pair
            ("r2", "a", "b"),                              # same paths, other repo
        ],
        "repo string, path string, new_path string",
    ).withColumn("op", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("rename"))
    cc = rename_components(renames).toPandas()
    lbl = {(r.repo, r.path): r.label for r in cc.itertuples()}
    assert lbl[("r1", "a")] == lbl[("r1", "b")] == lbl[("r1", "c")]
    assert lbl[("r1", "x")] == lbl[("r1", "y")]
    assert lbl[("r1", "x")] != lbl[("r1", "a")]
    assert lbl[("r2", "a")] != lbl[("r1", "a")]


def test_rename_components_distributed_long_chain(spark):
    """Force the distributed label-propagation path (driver threshold 0) on a
    12-hop rename chain: pointer-jumping must converge within max_iters and
    localCheckpoint must keep per-round lineage flat (VERDICT r1 item 9)."""
    from pyspark.sql import functions as F

    from skipmap_processor_spark.operators.dedup import rename_components

    hops = [("r1", f"p{i}", f"p{i+1}") for i in range(12)]  # p0 -> ... -> p12
    extra = [("r1", "qa", "qb"), ("r2", "p0", "p1")]
    renames = spark.createDataFrame(
        hops + extra, "repo string, path string, new_path string"
    ).withColumn("op", F.lit("rename"))
    cc = rename_components(renames, max_iters=8, max_edges_on_driver=0).toPandas()
    lbl = {(r.repo, r.path): r.label for r in cc.itertuples()}
    chain_labels = {lbl[("r1", f"p{i}")] for i in range(13)}
    assert len(chain_labels) == 1  # whole 12-hop chain is one component
    assert lbl[("r1", "qa")] == lbl[("r1", "qb")]
    assert lbl[("r1", "qa")] not in chain_labels
    assert lbl[("r2", "p0")] != lbl[("r1", "p0")]
