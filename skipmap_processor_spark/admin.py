"""Operational CLI for lake maintenance — the day-2 surface next to
``main.py``'s ingest entrypoint (reference precedent: run.sh's mode
dispatch, /root/reference/run.sh:7-80). Run like main.py, via
``spark-submit --py-files engine.zip`` on a cluster or ``python -m`` in
the sandbox:

    python -m skipmap_processor_spark.admin fsck    --lake /lake/repos --footers
    python -m skipmap_processor_spark.admin history --lake /lake/repos --limit 20
    python -m skipmap_processor_spark.admin stats   --lake /lake/repos
    python -m skipmap_processor_spark.admin compact --lake /lake/repos --plan-only
    python -m skipmap_processor_spark.admin vacuum  --lake /lake/repos --keep 2
    python -m skipmap_processor_spark.admin rescale --lake /lake/repos --to 128
    python -m skipmap_processor_spark.admin tag     --lake /lake/repos --create rel-1
    python -m skipmap_processor_spark.admin sql     --lake /lake/repos \\
        "DELETE FROM lake WHERE repo = 'gone/repo'"

Every command prints one JSON document on stdout (machine-consumable, like
main.py's per-epoch stats lines). ``sql`` routes MERGE INTO / DELETE FROM /
UPDATE statements through ``sql_merge``'s guarded parsers; the target table
name in the statement is ``--name`` (default ``lake``).
"""

from __future__ import annotations

import argparse
import json
import sys


def _json(obj) -> None:
    print(json.dumps(obj, default=str), flush=True)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="lake maintenance: fsck/history/stats/compact/vacuum/"
                    "rescale/tag/sql")
    ap.add_argument("command", choices=[
        "fsck", "history", "stats", "compact", "vacuum", "rescale", "tag",
        "sql"])
    ap.add_argument("statement", nargs="?", default=None,
                    help="SQL text (sql command only)")
    ap.add_argument("--lake", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--name", default="lake",
                    help="table name the SQL statement refers to")
    ap.add_argument("--footers", action="store_true",
                    help="fsck: also re-read parquet footers")
    ap.add_argument("--limit", type=int, default=None, help="history rows")
    ap.add_argument("--target", type=int, default=1,
                    help="compact: files per bucket")
    ap.add_argument("--plan-only", action="store_true",
                    help="compact: print the compaction plan, change nothing")
    ap.add_argument("--keep", type=int, default=2,
                    help="vacuum: manifest versions to retain")
    ap.add_argument("--grace", type=float, default=300.0,
                    help="vacuum: orphan grace seconds")
    ap.add_argument("--to", type=int, default=None,
                    help="rescale: new bucket count (grow-only multiple)")
    ap.add_argument("--create", default=None, help="tag: create NAME")
    ap.add_argument("--delete", default=None, help="tag: delete NAME")
    ap.add_argument("--version", type=int, default=None,
                    help="tag --create: pin this version (default: latest)")
    ap.add_argument("--epoch", type=int, default=None,
                    help="sql: exactly-once epoch for the statement")
    args = ap.parse_intermixed_args(argv)

    from skipmap_processor_spark.lake import LakeTable
    from skipmap_processor_spark.session import get_spark

    spark = get_spark(master=args.master, app_name=f"skipmap-admin-{args.command}")
    lake = LakeTable.load(spark, args.lake)

    if args.command == "fsck":
        rep = lake.fsck(check_footers=args.footers)
        _json(rep)
        return 0 if rep["ok"] else 1
    if args.command == "history":
        _json({"history": lake.history(limit=args.limit)})
        return 0
    if args.command == "stats":
        _json(lake.table_stats())
        return 0
    if args.command == "compact":
        if args.plan_only:
            _json(lake.compaction_plan())
            return 0
        plan = lake.compaction_plan()
        _json(lake.compact(target_files_per_bucket=args.target,
                           buckets=plan["buckets"] or None))
        return 0
    if args.command == "vacuum":
        _json(lake.vacuum(keep_versions=args.keep, grace_sec=args.grace))
        return 0
    if args.command == "rescale":
        if args.to is None:
            ap.error("rescale requires --to NEW_BUCKETS")
        _json(lake.rescale_buckets(args.to))
        return 0
    if args.command == "tag":
        if args.create:
            _json(lake.create_tag(args.create, version=args.version))
        elif args.delete:
            _json({"deleted": lake.delete_ref(args.delete)})
        else:
            _json({"refs": lake.refs()})
        return 0
    if args.command == "sql":
        if not args.statement:
            ap.error("sql requires a statement argument")
        from skipmap_processor_spark.sql_merge import (
            execute_alter_table,
            execute_delete_from,
            execute_merge_into,
            execute_update,
        )

        head = args.statement.lstrip().split(None, 1)[0].upper()
        tables = {args.name: lake}
        if head == "DELETE":
            _json(execute_delete_from(spark, args.statement, tables,
                                      epoch=args.epoch))
        elif head == "UPDATE":
            _json(execute_update(spark, args.statement, tables,
                                 epoch=args.epoch))
        elif head == "MERGE":
            _json(execute_merge_into(spark, args.statement, tables,
                                     epoch=args.epoch))
        elif head == "ALTER":
            _json(execute_alter_table(args.statement, tables))
        else:
            ap.error(f"unsupported statement {head!r}: expected DELETE/"
                     "UPDATE/MERGE/ALTER (reads go through the DataFrame "
                     "API; CREATE MATERIALIZED VIEW needs a views root — "
                     "use sql_merge.create_materialized_view)")
        return 0
    raise AssertionError("unreachable")


if __name__ == "__main__":
    sys.exit(main())
