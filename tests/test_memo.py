"""EnrichmentCache: expensive derived values computed once per key across
runs (reference cache-first DataLoader pattern)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from skipmap_processor_spark.operators.memo import EnrichmentCache

CALLS = {"n": 0}


def _expensive(df):
    CALLS["n"] += 1
    return df.select(
        "repo", "path",
        F.length("content").cast("bigint").alias("derived_len"),
        F.lower(F.sha2(F.col("content"), 256)).alias("derived_sha"),
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "repo string, path string, content string")


def test_second_run_serves_from_cache(spark, warehouse):
    cache = EnrichmentCache(spark, os.path.join(warehouse, "memo"),
                            ["repo", "path"], ["derived_len", "derived_sha"])
    rows = [("r1", f"p{i}.py", f"content-{i}") for i in range(20)]
    CALLS["n"] = 0
    out1 = cache.enrich(_docs(spark, rows), _expensive)
    got1 = {(r["repo"], r["path"]): (r["derived_len"], r["derived_sha"])
            for r in out1.collect()}
    assert len(got1) == 20 and CALLS["n"] == 1

    # identical second run: compute() must not be invoked at all
    CALLS["n"] = 0
    out2 = cache.enrich(_docs(spark, rows), _expensive)
    got2 = {(r["repo"], r["path"]): (r["derived_len"], r["derived_sha"])
            for r in out2.collect()}
    assert got2 == got1
    assert CALLS["n"] == 0, "all keys cached - no recompute"


def test_partial_miss_computes_only_new_keys(spark, warehouse):
    cache = EnrichmentCache(spark, os.path.join(warehouse, "memo2"),
                            ["repo", "path"], ["derived_len", "derived_sha"])
    first = [("r1", f"a{i}.py", f"v{i}") for i in range(10)]
    cache.enrich(_docs(spark, first), _expensive)

    mixed = first[:5] + [("r2", f"b{i}.py", f"w{i}") for i in range(3)]
    seen_miss_keys = []

    def probe(df):
        seen_miss_keys.extend(
            (r["repo"], r["path"]) for r in df.select("repo", "path").collect())
        return _expensive(df)

    out = cache.enrich(_docs(spark, mixed), probe)
    assert out.count() == 8
    assert sorted(seen_miss_keys) == [("r2", f"b{i}.py") for i in range(3)]
    # cache now serves the union
    CALLS["n"] = 0
    cache.enrich(_docs(spark, mixed), _expensive).collect()
    assert CALLS["n"] == 0
