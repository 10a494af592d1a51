"""A/B the session GC/JIT flags on the query workload (VERDICT r3 item 2).

Round 3 regressed the per-query bench 3-7x vs round 2 while CDC stayed
fast. The r3 session grew `-XX:+UseParallelGC -XX:ParallelGCThreads=N
-XX:CICompilerCount=4` — flags validated on the CDC replay, inherited
untested by the 42-query bench session. This runs a regressed-query subset
at sf0.1 in a fresh subprocess JVM per flag config (quiet-gated), with an
in-run steal ledger, and prints per-query medians.

Usage: python tools/ab_gcflags.py [reps=3]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QUERY_SUBSET = ["a1_pricing_rollup", "s18_view_sql", "j5_anti_join",
                "w1_lww_dedup", "p1_filter_project", "dedup_ngram_jaccard",
                "sim_ivf_topk", "text_langid"]

CONFIGS = {
    "r3_parallel_cci4": "-XX:+UseParallelGC -XX:ParallelGCThreads=32 "
                        "-XX:CICompilerCount=4",
    "stock": "",
    "parallel_only": "-XX:+UseParallelGC -XX:ParallelGCThreads=32",
    "cci4_only": "-XX:CICompilerCount=4",
}

_CHILD = """
import json, os, sys, time
sys.path.insert(0, {root!r})
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from pyspark.sql import SparkSession
from skipmap_processor_spark.plans.queries import QUERIES

flags = {flags!r}
b = (SparkSession.builder.master("local[32]").appName("abgc")
     .config("spark.sql.shuffle.partitions", "32")
     .config("spark.driver.memory", "16g")
     .config("spark.sql.session.timeZone", "UTC")
     .config("spark.sql.execution.arrow.pyspark.enabled", "true")
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.sql.autoBroadcastJoinThreshold", str(64*1024*1024))
     .config("spark.ui.enabled", "false")
     .config("spark.driver.host", "127.0.0.1"))
if flags:
    b = b.config("spark.driver.extraJavaOptions", flags)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"
names = {names!r}
# same warmup queries bench.py uses
for w in ("a1_pricing_rollup", "dedup_ngram_jaccard", "w1_lww_dedup"):
    QUERIES[w](spark, sf_dir).count()
out = {{}}
for rep in range({reps}):
    for n in names:
        t0 = time.monotonic()
        QUERIES[n](spark, sf_dir).count()
        out.setdefault(n, []).append(round(time.monotonic() - t0, 3))
print("RESULT" + json.dumps(out))
"""


def steal_cpu_snap():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:9]]
    return sum(vals), vals[7]  # total jiffies, steal jiffies


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from bench.scaling import kill_stray_probes, wait_quiet

    kill_stray_probes()
    results = {}
    for cname, flags in CONFIGS.items():
        pre = wait_quiet()
        t0_tot, t0_steal = steal_cpu_snap()
        t0 = time.monotonic()
        child = _CHILD.format(root=ROOT, flags=flags, names=QUERY_SUBSET,
                              reps=reps)
        out = subprocess.run([sys.executable, "-c", child],
                             capture_output=True, text=True, timeout=1200)
        t1_tot, t1_steal = steal_cpu_snap()
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT")]
        if not line:
            print(f"{cname}: FAILED rc={out.returncode} "
                  f"{out.stderr[-400:]}")
            continue
        per_q = json.loads(line[0][len("RESULT"):])
        med = {n: sorted(v)[len(v) // 2] for n, v in per_q.items()}
        steal_frac = (t1_steal - t0_steal) / max(t1_tot - t0_tot, 1)
        results[cname] = {
            "median_per_query": med,
            "total_median_sec": round(sum(med.values()), 3),
            "wall_sec": round(time.monotonic() - t0, 1),
            "pre_steal_frac": round(pre, 4) if pre is not None else None,
            "in_run_steal_frac": round(steal_frac, 4),
            "all_reps": per_q,
        }
        print(json.dumps({cname: results[cname]["median_per_query"],
                          "total": results[cname]["total_median_sec"],
                          "steal": results[cname]["in_run_steal_frac"]}))
    with open(os.path.join(ROOT, "BENCH", "ab_gcflags.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("written BENCH/ab_gcflags.json")


if __name__ == "__main__":
    main()
