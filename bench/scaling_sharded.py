"""Sharded-executor scaling evidence: N vs 4N EXECUTORS, each its own JVM.

The single-JVM stand-in (bench/scaling.py: local[N] vs local[4N]) makes
the 4N leg share ONE heap, ONE GC, and ONE memory controller across all
threads — a real 4N-executor cluster gives every executor its own. This
protocol models executors faithfully:

- executor := a 4-core local[4] JVM with its own 8 GB heap;
- the key space is range-owned: executor i owns global buckets
  {b : b % n_shards == i} (standard bucket-range ownership — a binlog
  router ships each change to its bucket's owner, no cross-executor
  shuffle for a key-partitioned MERGE, exactly like co-located bucketed
  writes on a real cluster);
- A leg = 1 executor replaying the whole log;
- B leg = 4 executors running CONCURRENTLY, each replaying its shard;
  B wall = max(shard walls), throughput = total events / B wall.

Per-executor config is IDENTICAL in both legs (4 cores, same heap, same
shuffle-partition count per 16M-event shard => same rows per task). The
two stand-ins bracket a real cluster: the single-JVM one overstates
runtime sharing, this one omits network. Report both.

Usage: python bench/scaling_sharded.py [--events 64000000] [--shards 4]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ensure_split(n_keys: int, n_events: int, n_epochs: int,
                 n_shards: int) -> dict:
    """Split the cached bulk log by bucket ownership: shard i gets rows
    whose xxhash64(repo,path) % (32*n_shards... ) — we reuse the lake's own
    bucket function with nb=32 and route bucket % n_shards. Cached."""
    from bench.cdc_bench import ensure_event_log

    sig = f"shard{n_shards}_k{n_keys}_e{n_events}_p{n_epochs}"
    outdir = os.path.join(REPO, ".data", "bench_events", sig)
    meta_path = os.path.join(outdir, "_META.json")
    if os.path.exists(meta_path):
        return json.load(open(meta_path))
    src = ensure_event_log(n_keys, n_events, n_epochs)

    from pyspark.sql import functions as F

    from skipmap_processor_spark.lake import bucket_expr
    from skipmap_processor_spark.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions=32,
                      driver_memory="16g", app_name="shard-split")
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(src)
    ev = ev.withColumn("_shard",
                       F.pmod(bucket_expr(32), F.lit(n_shards)))
    counts = {int(r["_shard"]): int(r["n"]) for r in
              ev.groupBy("_shard").agg(F.count("*").alias("n")).collect()}
    for s in range(n_shards):
        (ev.filter(F.col("_shard") == s).drop("_shard")
         .repartition(1)
         .write.partitionBy("epoch").mode("overwrite")
         .parquet(os.path.join(outdir, f"shard{s}")))
    spark.stop()
    meta = {"outdir": outdir, "counts": counts, "n_shards": n_shards}
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta


def _shm_copy(src: str, sig: str) -> str:
    import shutil

    shm = os.path.join("/dev/shm/skipmap_bench_inputs", sig)
    if not os.path.exists(os.path.join(shm, "_COPIED")):
        shutil.rmtree(shm, ignore_errors=True)
        shutil.copytree(src, shm)
        open(os.path.join(shm, "_COPIED"), "w").write("ok")
    return shm


def leg_cmd(events_dir: str, n_events: int, epochs: int, mode: str,
            warmup: int, sha: str, sp: int) -> list[str]:
    return [
        sys.executable, os.path.join(REPO, "bench", "cdc_bench.py"),
        "--cpus", "4", "--keys", "300000", "--events", str(n_events),
        "--epochs", str(epochs), "--mode", mode,
        "--warmup-epochs", str(warmup), "--sha", sha,
        "--shuffle-partitions", str(sp),
        "--events-dir", events_dir,
    ]


def main() -> None:
    from bench.scaling import kill_stray_probes, wait_quiet

    kill_stray_probes()
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=300_000)
    ap.add_argument("--events", type=int, default=64_000_000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--mode", default="mor")
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--sha", default="jvm")
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--sp", type=int, default=32,
                    help="shuffle partitions PER EXECUTOR shard (same "
                         "rows/task in both legs)")
    ap.add_argument("--wait-quiet", action="store_true")
    args = ap.parse_args()

    meta = ensure_split(args.keys, args.events, args.epochs, args.shards)
    from bench.cdc_bench import ensure_event_log

    full_dir = ensure_event_log(args.keys, args.events, args.epochs)

    # ----- A leg: 1 executor, whole log. Same per-task rows: the full log
    # is shards x bigger, so it gets shards x the partitions.
    pre_a = wait_quiet() if args.wait_quiet else None
    out = subprocess.run(
        leg_cmd(full_dir, args.events, args.epochs, args.mode, args.warmup,
                args.sha, args.sp * args.shards),
        capture_output=True, text=True, cwd=REPO, timeout=3600)
    a = json.loads([ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1])

    # ----- B leg: `shards` executors concurrently, each its own shard.
    pre_b = wait_quiet() if args.wait_quiet else None
    procs = []
    t0 = time.monotonic()
    for s in range(args.shards):
        sdir = _shm_copy(os.path.join(meta["outdir"], f"shard{s}"),
                         f"shard{args.shards}_{args.events}_{s}")
        procs.append(subprocess.Popen(
            leg_cmd(sdir, meta["counts"][str(s)] if str(s) in meta["counts"]
                    else meta["counts"][s],
                    args.epochs, args.mode, args.warmup, args.sha, args.sp),
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            cwd=REPO))
    shard_results = []
    for p in procs:
        sout, _ = p.communicate(timeout=3600)
        shard_results.append(json.loads(
            [ln for ln in sout.splitlines() if ln.startswith("{")][-1]))
    _ = time.monotonic() - t0
    # bench-internal wall of the slowest executor — symmetric with the A
    # leg's wall_sec, which also excludes JVM startup and untimed warmup
    b_wall = max(r["wall_sec"] for r in shard_results)

    tot_events = sum(r["n_events"] for r in shard_results)
    # steady: exclude each shard's first epoch, take the max shard steady
    # window (the cluster is as fast as its slowest executor)
    b_steady_wall = max(
        sum(r["per_epoch_sec"][1:]) + r["compact_sec"] for r in shard_results)
    b_steady_events = sum(
        r["n_events"] - r["n_events"] // r["n_epochs"] for r in shard_results)
    b = {
        "executors": args.shards,
        "wall_sec": round(b_wall, 3),
        "events_per_sec": round(tot_events / b_wall, 1),
        "steady_events_per_sec": round(b_steady_events / b_steady_wall, 1),
        "proc_cpu_sec": round(sum(r["proc_cpu_sec"] for r in shard_results), 1),
        "steal_sec": max(r["steal_sec"] for r in shard_results),
        "per_shard_steady": [r["steady_events_per_sec"] for r in shard_results],
        "per_shard_events": [r["n_events"] for r in shard_results],
    }

    eff_total = (b["events_per_sec"] / a["events_per_sec"]) / args.shards
    eff_steady = (b["steady_events_per_sec"]
                  / a["steady_events_per_sec"]) / args.shards
    eff_cpu = (a["proc_cpu_sec"] / a["n_events"]) / (
        b["proc_cpu_sec"] / tot_events)

    rec = {"ts": datetime.now(timezone.utc).isoformat(),
           "protocol": "sharded-executors",
           "events": args.events, "epochs": args.epochs, "mode": args.mode,
           "sha": args.sha, "sp_per_exec": args.sp,
           "pre_steal_a": pre_a, "pre_steal_b": pre_b,
           "eff_total": round(eff_total, 3),
           "eff_steady": round(eff_steady, 3),
           "eff_cpu": round(eff_cpu, 3),
           "a": a, "b": b}
    with open(os.path.join(REPO, "BENCH", "sharded_history.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
