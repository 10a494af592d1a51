"""Round-6 optimization harness (bench.py is frozen for measurement).

Times individual registered queries in isolation — same methodology as
bench.py's query phase (`.count()` forces full execution with no driver-side
row transfer) plus an optional noop-sink mode (guide §1.4) that computes
every column. Also dumps `.explain("formatted")` per query so plan claims in
OPTIMIZATION_r06.md are checkable offline.

Usage:
    python bench_extra.py [--sf-dir DIR] [--mode count|noop] [--passes N]
                          [--explain-dir plans/r06] [--suffix before|after]
                          [query ...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--mode", choices=("count", "noop"), default="count")
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--warmup", action="store_true",
                    help="run bench.py's warmup set first")
    ap.add_argument("--explain-dir", default=None,
                    help="write <query>_<suffix>.txt explains here")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from skipmap_processor_spark.plans.queries import QUERIES
    from skipmap_processor_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                      driver_memory="16g", app_name="bench_extra")
    spark.sparkContext.setLogLevel("ERROR")

    names = args.queries or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if args.warmup:
        for n in ("a1_pricing_rollup", "dedup_ngram_jaccard",
                  "sim_topk_cosine", "w1_lww_dedup",
                  "sim_lsh_multiprobe_topk"):
            QUERIES[n](spark, args.sf_dir).count()

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)

    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        if args.explain_dir:
            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.explain_dir,
                                f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
        secs: list[float] = []
        if args.passes <= 0:
            continue
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"{name} [{args.mode}]")
            t0 = time.monotonic()
            df = fn(spark, args.sf_dir)
            if args.mode == "count":
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            secs.append(round(time.monotonic() - t0, 3))
        out[name] = min(secs)
        print(json.dumps({"q": name, "sec": min(secs), "samples": secs}),
              flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "mode": args.mode,
                      "total": round(sum(out.values()), 3),
                      "queries": out}), flush=True)


if __name__ == "__main__":
    main()
