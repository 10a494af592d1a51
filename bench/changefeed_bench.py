"""Change-feed / incremental-view maintenance bench.

The claim under test: after a small delta lands on a big table, an
``IncrementalView.refresh()`` costs O(changes) — feed extraction plus a
union-re-agg over |state| + |delta| — while the naive consumer (the
reference's clustering pipeline, ``DataLoader.ts:45-48``) pays a full
table rescan. Reports both walls and the ratio, on the same session, same
table, same quiet window.

    python bench/changefeed_bench.py --rows 2000000 --changes 20000 --cpus 8

Prints one JSON line. Used by bench.py (subprocess, quiet-gated phase).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _base_df(spark, rows: int):
    """Deterministic synthetic corpus: key space, 40-way repo spread,
    content whose length varies by key so group metrics are non-trivial."""
    from pyspark.sql import functions as F

    return (
        spark.range(rows)
        .select(
            F.concat(F.lit("repo-"), (F.col("id") % 40).cast("string")).alias("repo"),
            F.concat(F.lit("src/f"), F.col("id").cast("string"), F.lit(".py")).alias("path"),
            F.lpad(F.hex(F.col("id")), 40, "0").alias("commit"),
            F.col("id").alias("event_seq"),
            F.lit("upsert").alias("op"),
            F.element_at(
                F.array(F.lit("python"), F.lit("go"), F.lit("rust"), F.lit("ts")),
                ((F.col("id") % 4) + 1).cast("int"),
            ).alias("lang"),
            F.repeat(F.lit("x"), ((F.col("id") % 97) + 8).cast("int")).alias("content"),
            F.lpad(F.hex(F.xxhash64(F.col("id"))), 64, "0").alias("content_sha"),
        )
    )


def run(cpus: int, rows: int, changes: int, buckets: int,
        merge_mode: str) -> dict:
    from pyspark.sql import functions as F

    from skipmap_processor_spark.changefeed import IncrementalView, table_changes
    from skipmap_processor_spark.lake import LakeTable
    from skipmap_processor_spark.session import get_spark

    scratch = f"/dev/shm/skipmap_cf_bench_{os.getpid()}"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=cpus * 2,
        driver_memory=f"{max(2 * cpus, 8)}g", app_name=f"cf-bench-{cpus}",
        extra_conf={"spark.local.dir": os.path.join(scratch, "spark-local")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    lake = LakeTable.create(spark, os.path.join(scratch, "lake"),
                            num_buckets=buckets, merge_mode=merge_mode)
    lake.merge_batch(_base_df(spark, rows), epoch=0)

    view = IncrementalView(
        spark, lake, os.path.join(scratch, "view"),
        group_cols=["lang"],
        metrics={"n_files": "1", "total_bytes": "length(content)"},
    )
    t0 = time.monotonic()
    assert view.refresh()["mode"] == "full"
    full_build_sec = time.monotonic() - t0

    # extrema twin: same group/metrics plus min/max maintained by
    # fold-on-insert + bounded recompute-on-retraction (the delta below
    # deletes max-length rows, so the retraction path runs at bench scale)
    ext_view = IncrementalView(
        spark, lake, os.path.join(scratch, "view_ext"),
        group_cols=["lang"],
        metrics={"n_files": "1", "total_bytes": "length(content)"},
        extrema={"max_bytes": ("max", "length(content)"),
                 "min_bytes": ("min", "length(content)")},
    )
    assert ext_view.refresh()["mode"] == "full"

    # distinct twin: exact retractable COUNT DISTINCT via the signed
    # auxiliary multiset (realistic dashboard shape: low-cardinality
    # value domains per group; the delta's deletes retract supports and
    # its inserts add a brand-new lang)
    dist_view = IncrementalView(
        spark, lake, os.path.join(scratch, "view_dist"),
        group_cols=["repo"],
        metrics={"n_files": "1"},
        distinct={"n_langs": "lang",
                  "n_exts": "substring_index(path, '.', -1)"},
    )
    assert dist_view.refresh()["mode"] == "full"

    # delta: updates on an evenly-spread key subset, 10% deletes, 10% new
    # keys — every change class exercised, deterministic
    n_upd = changes - 2 * (changes // 10)
    stride = max(rows // max(n_upd, 1), 1)
    upd = (
        _base_df(spark, rows)
        .filter((F.col("event_seq") % stride) == 0)
        .limit(n_upd)
        .withColumn("commit", F.lpad(F.hex(F.col("event_seq") + rows), 40, "1"))
        .withColumn("event_seq", F.col("event_seq") + rows)
        .withColumn("content", F.repeat(F.lit("y"),
                                        ((F.col("event_seq") % 53) + 4).cast("int")))
    )
    dele = (
        _base_df(spark, rows)
        .filter((F.col("event_seq") % stride) == 1)
        .limit(changes // 10)
        .withColumn("op", F.lit("delete"))
        .withColumn("commit", F.lpad(F.hex(F.col("event_seq") + rows), 40, "2"))
        .withColumn("event_seq", F.col("event_seq") + rows)
    )
    ins = (
        spark.range(rows, rows + changes // 10)
        .select(
            F.concat(F.lit("repo-"), (F.col("id") % 40).cast("string")).alias("repo"),
            F.concat(F.lit("src/g"), F.col("id").cast("string"), F.lit(".py")).alias("path"),
            F.lpad(F.hex(F.col("id")), 40, "3").alias("commit"),
            F.col("id").alias("event_seq"),
            F.lit("upsert").alias("op"),
            F.lit("zig").alias("lang"),
            F.repeat(F.lit("z"), 16).alias("content"),
            F.lpad(F.hex(F.xxhash64(F.col("id"))), 64, "0").alias("content_sha"),
        )
    )
    delta = upd.unionByName(dele).unionByName(ins)
    n_delta = delta.count()
    v_pre = lake._latest_version()
    lake.merge_batch(delta, epoch=1)
    v_post = lake._latest_version()

    # feed extraction alone (the primitive every consumer shares)
    t0 = time.monotonic()
    n_changes_out = table_changes(lake, v_pre, v_post).count()
    feed_sec = time.monotonic() - t0

    t0 = time.monotonic()
    r = view.refresh()
    incremental_sec = time.monotonic() - t0
    assert r["mode"] == "incremental", r

    t0 = time.monotonic()
    r_ext = ext_view.refresh()
    ext_incremental_sec = time.monotonic() - t0
    assert r_ext["mode"] == "incremental", r_ext

    t0 = time.monotonic()
    r_dist = dist_view.refresh()
    dist_incremental_sec = time.monotonic() - t0
    assert r_dist["mode"] == "incremental", r_dist

    # the naive consumer: full rebuild at the same final version
    naive = IncrementalView(
        spark, lake, os.path.join(scratch, "view_naive"),
        group_cols=["lang"],
        metrics={"n_files": "1", "total_bytes": "length(content)"},
    )
    t0 = time.monotonic()
    assert naive.refresh()["mode"] == "full"
    full_rebuild_sec = time.monotonic() - t0

    # equivalence: the incremental state must equal the rebuilt state
    a = {tuple(x) for x in view.read().collect()}
    b = {tuple(x) for x in naive.read().collect()}
    assert a == b, "incremental state diverged from full rebuild"

    # extrema equivalence vs a fresh rebuild at the same version
    naive_ext = IncrementalView(
        spark, lake, os.path.join(scratch, "view_ext_naive"),
        group_cols=["lang"],
        metrics={"n_files": "1", "total_bytes": "length(content)"},
        extrema={"max_bytes": ("max", "length(content)"),
                 "min_bytes": ("min", "length(content)")},
    )
    t0 = time.monotonic()
    assert naive_ext.refresh()["mode"] == "full"
    ext_full_rebuild_sec = time.monotonic() - t0
    a = {tuple(x) for x in ext_view.read().collect()}
    b = {tuple(x) for x in naive_ext.read().collect()}
    assert a == b, "extrema incremental state diverged from full rebuild"

    # distinct equivalence vs a fresh rebuild at the same version
    naive_dist = IncrementalView(
        spark, lake, os.path.join(scratch, "view_dist_naive"),
        group_cols=["repo"],
        metrics={"n_files": "1"},
        distinct={"n_langs": "lang",
                  "n_exts": "substring_index(path, '.', -1)"},
    )
    t0 = time.monotonic()
    assert naive_dist.refresh()["mode"] == "full"
    dist_full_rebuild_sec = time.monotonic() - t0
    a = {tuple(x) for x in dist_view.read().collect()}
    b = {tuple(x) for x in naive_dist.read().collect()}
    assert a == b, "distinct incremental state diverged from full rebuild"

    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)
    return {
        "cpus": cpus,
        "rows": rows,
        "delta_rows": n_delta,
        "feed_change_rows": n_changes_out,
        "merge_mode": merge_mode,
        "full_build_sec": round(full_build_sec, 3),
        "feed_extract_sec": round(feed_sec, 3),
        "incremental_refresh_sec": round(incremental_sec, 3),
        "full_rebuild_sec": round(full_rebuild_sec, 3),
        "speedup_vs_rescan": round(full_rebuild_sec / max(incremental_sec, 1e-9), 2),
        "ext_incremental_refresh_sec": round(ext_incremental_sec, 3),
        "ext_full_rebuild_sec": round(ext_full_rebuild_sec, 3),
        "ext_recomputed_groups": r_ext.get("ext_recomputed_groups"),
        "ext_speedup_vs_rescan": round(
            ext_full_rebuild_sec / max(ext_incremental_sec, 1e-9), 2),
        "dist_incremental_refresh_sec": round(dist_incremental_sec, 3),
        "dist_full_rebuild_sec": round(dist_full_rebuild_sec, 3),
        "dist_speedup_vs_rescan": round(
            dist_full_rebuild_sec / max(dist_incremental_sec, 1e-9), 2),
    }


def _trickle_row(spark, i: int):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [("repo-trickle", f"src/t{i % 53}.py", f"{i:016x}" + "b" * 24, i,
          "delete" if i % 9 == 4 else "upsert")],
        "repo string, path string, commit string, event_seq bigint, op string",
    ).select(
        "*",
        F.lit("python").alias("lang"),
        F.repeat(F.lit("t"), (i % 41) + 4).alias("content"),
        F.lpad(F.hex(F.xxhash64(F.lit(i))), 64, "0").alias("content_sha"),
    )


def run_catchup(cpus: int, versions: int, buckets: int,
                base_rows: int) -> dict:
    """Wide-range catch-up cost (VERDICT r4 item 5): a consumer resuming
    across ``versions`` trickle commits. Claim: discovery is O(changes) —
    origin-tagged shards mean the driver-side manifest walk loads exactly
    one shard per trickle commit and never rebuilds a snapshot path set —
    and the feed's data cost is endpoint-image-bounded, independent of how
    many versions the range spans.

    The trickle table is an expensive fixture (1000 real one-row merges),
    built once under ``.data/cf_catchup/<key>`` and reused across rounds;
    only the catch-up reads are measured."""
    import json as _json

    from skipmap_processor_spark.changefeed import _added_entries, table_changes
    from skipmap_processor_spark.lake import LakeTable
    from skipmap_processor_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    key = f"v1-{versions}-{buckets}-{base_rows}"
    fix = os.path.join(repo, ".data", "cf_catchup", key)
    marker = os.path.join(fix, "_FIXTURE_DONE.json")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                      driver_memory="8g", app_name=f"cf-catchup-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    build_sec = None
    if not os.path.exists(marker):
        shutil.rmtree(fix, ignore_errors=True)
        os.makedirs(fix, exist_ok=True)
        lake = LakeTable.create(spark, os.path.join(fix, "lake"),
                                num_buckets=buckets, merge_mode="mor")
        lake.merge_batch(_base_df(spark, base_rows), epoch=0)
        v_boot = lake._latest_version()
        t0 = time.monotonic()
        for i in range(1, versions + 1):
            lake.merge_batch(_trickle_row(spark, i), epoch=i)
        build_sec = round(time.monotonic() - t0, 1)
        with open(marker, "w") as f:
            _json.dump({"v_boot": v_boot, "build_sec": build_sec}, f)
    with open(marker) as f:
        meta = _json.load(f)
    v_boot = meta["v_boot"]
    # fresh instance: empty shard cache, so discovery timing includes its
    # real metadata I/O
    lake = LakeTable.load(spark, os.path.join(fix, "lake"))
    latest = lake._latest_version()

    t0 = time.monotonic()
    ents = _added_entries(lake, v_boot, latest)
    discovery_sec = time.monotonic() - t0

    t0 = time.monotonic()
    n_changes = table_changes(lake, v_boot, latest).count()
    catchup_sec = time.monotonic() - t0

    t0 = time.monotonic()
    n_last10 = table_changes(lake, max(latest - 10, v_boot), latest).count()
    last10_sec = time.monotonic() - t0

    spark.stop()
    walked = latest - v_boot
    return {
        "versions_walked": walked,
        "candidate_files": len(ents),
        "discovery_sec": round(discovery_sec, 3),
        "discovery_ms_per_version": round(discovery_sec * 1000 / walked, 3),
        "catchup_feed_sec": round(catchup_sec, 3),
        "catchup_change_rows": n_changes,
        "feed_last10_sec": round(last10_sec, 3),
        "catchup_vs_last10_ratio": round(catchup_sec / max(last10_sec, 1e-9),
                                         2),
        "fixture_build_sec": meta.get("build_sec"),
        "fixture_cached": build_sec is None,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--changes", type=int, default=20_000)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--mode", choices=["cow", "mor"], default="mor")
    ap.add_argument("--catchup-versions", type=int, default=0,
                    help="run the wide-range catch-up bench instead")
    ap.add_argument("--base-rows", type=int, default=200_000)
    args = ap.parse_args()
    if args.catchup_versions:
        print(json.dumps(run_catchup(args.cpus, args.catchup_versions,
                                     args.buckets, args.base_rows)))
    else:
        print(json.dumps(run(args.cpus, args.rows, args.changes,
                             args.buckets, args.mode)))
