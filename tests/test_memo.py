"""EnrichmentCache: expensive derived values computed once per key across
runs (reference cache-first DataLoader pattern). Contract (r4): compute()
may be invoked with an EMPTY frame (the write is unconditional — no
driver-side probe job), so the guarantee tested is "zero miss ROWS reach
compute", not "compute never called"; writes are distributed Spark part
files, never a driver collect; entries TTL-expire; fold() compacts."""

from __future__ import annotations

import os
import time

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


def _probe(seen):
    def probe(df):
        seen.extend((r["repo"], r["path"])
                    for r in df.select("repo", "path").collect())
        return _expensive(df)
    return probe


def test_second_run_serves_from_cache(spark, warehouse):
    cache = EnrichmentCache(spark, os.path.join(warehouse, "memo"),
                            ["repo", "path"], ["derived_len", "derived_sha"])
    rows = [("r1", f"p{i}.py", f"content-{i}") for i in range(20)]
    out1 = cache.enrich(_docs(spark, rows), _expensive)
    got1 = {(r["repo"], r["path"]): (r["derived_len"], r["derived_sha"])
            for r in out1.collect()}
    assert len(got1) == 20

    # identical second run: zero miss rows may reach compute()
    seen = []
    out2 = cache.enrich(_docs(spark, rows), _probe(seen))
    got2 = {(r["repo"], r["path"]): (r["derived_len"], r["derived_sha"])
            for r in out2.collect()}
    assert got2 == got1
    assert seen == [], "all keys cached - no rows recomputed"
    # the cache write path is distributed: Spark part files, no pandas blob
    files = [f for _, _, fs in os.walk(cache.path) for f in fs]
    assert any(f.startswith("part-") and f.endswith(".parquet")
               for f in files), files


def test_append_never_lists_cache_dir(spark, warehouse, monkeypatch):
    """Object-store safety (VERDICT r4 item 6): enrich() performs ZERO
    directory listings of the cache path — in particular none between
    writing the fresh part and reading it back (each append is read back
    by its own exact uuid-subdirectory path)."""
    from skipmap_processor_spark.operators import memo as memo_mod

    cache = EnrichmentCache(spark, os.path.join(warehouse, "memo6"),
                            ["repo", "path"], ["derived_len", "derived_sha"])
    real_listdir, real_scandir = os.listdir, os.scandir
    listed = []

    def spy_listdir(path="."):
        if str(path).startswith(cache.path):
            listed.append(("listdir", str(path)))
        return real_listdir(path)

    def spy_scandir(path="."):
        if str(path).startswith(cache.path):
            listed.append(("scandir", str(path)))
        return real_scandir(path)

    monkeypatch.setattr(memo_mod.os, "listdir", spy_listdir)
    monkeypatch.setattr(memo_mod.os, "scandir", spy_scandir)
    rows = [("r1", f"p{i}.py", f"c{i}") for i in range(6)]
    out = cache.enrich(_docs(spark, rows), _expensive)
    assert out.count() == 6
    seen = []
    out2 = cache.enrich(_docs(spark, rows), _probe(seen))
    assert out2.count() == 6 and seen == []
    assert listed == [], listed


def test_partial_miss_computes_only_new_keys(spark, warehouse):
    cache = EnrichmentCache(spark, os.path.join(warehouse, "memo2"),
                            ["repo", "path"], ["derived_len", "derived_sha"])
    first = [("r1", f"a{i}.py", f"v{i}") for i in range(10)]
    cache.enrich(_docs(spark, first), _expensive)

    mixed = first[:5] + [("r2", f"b{i}.py", f"w{i}") for i in range(3)]
    seen = []
    out = cache.enrich(_docs(spark, mixed), _probe(seen))
    assert out.count() == 8
    assert sorted(seen) == [("r2", f"b{i}.py") for i in range(3)]
    # cache now serves the union
    seen2 = []
    cache.enrich(_docs(spark, mixed), _probe(seen2)).collect()
    assert seen2 == []


def test_duplicate_key_input_no_fanout(spark, warehouse):
    """Multiple input rows per key must not multiply output rows: fresh
    results are key-deduped before the final left join (ADVICE r3)."""
    cache = EnrichmentCache(spark, os.path.join(warehouse, "memo3"),
                            ["repo", "path"], ["derived_len", "derived_sha"])
    rows = [("r1", "dup.py", "same-content")] * 3 + [("r1", "one.py", "x")]
    out = cache.enrich(_docs(spark, rows), _expensive)
    assert out.count() == 4, "left join fan-out on duplicate keys"
    vals = {r["path"]: r["derived_len"] for r in out.collect()}
    assert vals == {"dup.py": 12, "one.py": 1}
    # second run with the same duplicates: still no fan-out, no misses
    seen = []
    out2 = cache.enrich(_docs(spark, rows), _probe(seen))
    assert out2.count() == 4 and seen == []


def test_ttl_expiry_recomputes(spark, warehouse):
    cache = EnrichmentCache(spark, os.path.join(warehouse, "memo4"),
                            ["repo", "path"], ["derived_len", "derived_sha"],
                            ttl_sec=3600.0)
    rows = [("r1", "a.py", "hello")]
    cache.enrich(_docs(spark, rows), _expensive).collect()
    # within TTL: served from cache
    seen = []
    cache.enrich(_docs(spark, rows), _probe(seen)).collect()
    assert seen == []
    # shrink the TTL below the entry's age (ttl is read at _read time, so
    # this is a deterministic expiry without sleeping past Spark job time)
    cache.ttl_sec = 0.001
    time.sleep(0.05)
    # past TTL: the key is a miss again and gets recomputed + re-appended
    seen2 = []
    out = cache.enrich(_docs(spark, rows), _probe(seen2)).collect()
    assert seen2 == [("r1", "a.py")]
    assert out[0]["derived_len"] == 5
    # fold() (ttl restored) keeps one latest-wins row across generations
    cache.ttl_sec = 3600.0
    assert cache.fold() == 1
    cache_reread = cache._read()
    assert cache_reread is not None and cache_reread.count() == 1


def test_fold_compacts_append_log(spark, warehouse):
    cache = EnrichmentCache(spark, os.path.join(warehouse, "memo5"),
                            ["repo", "path"], ["derived_len", "derived_sha"])
    for gen in range(3):
        rows = [("r1", f"g{gen}-{i}.py", "c" * (gen + 1)) for i in range(4)]
        cache.enrich(_docs(spark, rows), _expensive).collect()
    assert cache.fold() == 12
    # folded cache serves every generation with zero recompute
    allrows = [("r1", f"g{g}-{i}.py", "c" * (g + 1))
               for g in range(3) for i in range(4)]
    seen = []
    out = cache.enrich(_docs(spark, allrows), _probe(seen))
    assert seen == [] and out.count() == 12
