"""``lake_changefeed`` — a Structured Streaming source over a LakeTable.

``changefeed.table_changes`` gives batch consumers the net diff between two
snapshots; this module makes the same commit log *tailable* with Spark's
native streaming machinery (Spark 4 Python DataSource API):

    spark.dataSource.register(LakeChangefeedDataSource)
    feed = (spark.readStream.format("lake_changefeed")
            .option("path", table_path)
            .option("startingVersion", 0)   # or omit: tail from now
            .load())

Semantics — the *row-level write stream* of the table, the shape a binlog
tail gives (Delta CDF's ``readChangeFeed`` analog; reference precedent: its
consumers poll the events feed and re-read affected ranges,
``/root/reference/src/utils/PostgresCache.ts:209-317``). Each micro-batch
covers a contiguous manifest-version range ``(start, end]`` and emits every
upsert/delete image those merge commits appended, stamped with
``_change_type`` (``upsert`` | ``delete``) and ``_commit_version``. Rows
are exactly-once per offset range: offsets are committed by Spark's
checkpoint, version ranges map deterministically to immutable files, so a
replayed batch re-reads identical rows.

Scale shape (same discipline as ``changefeed._added_entries``):

- **driver work is metadata-only**: one manifest JSON per version in the
  range; non-logical commits (``compact``/``metadata``/DDL) are skipped by
  ``commit_kind``, replacement shards by their ``origin: rewrite`` tag —
  no snapshot file-set is ever built, so a tailing consumer pays
  O(changes), never O(table).
- **data reads are executor-side**: each input partition is one immutable
  delta file, read with pyarrow straight into Arrow record batches (no
  Python row loop); column rebinding by field id (renames/widenings/adds
  between the file's schema version and the stream's) happens on the
  Arrow columns.

MOR only, by construction: a MOR merge appends exactly the batch's write
images as delta files, so "files added by merge commits" IS the change
stream. A CoW merge rewrites whole buckets (its outputs mix changed and
carried rows), so tailing one this way would overstate changes — the
reader refuses at start and points to ``changefeed.table_changes`` /
``FeedFollower``, which compute exact net changes for both modes.

Mid-stream schema evolution: the output schema is pinned at stream start
(Spark streaming schemas are static). Later files are rebound to it by
field id — renamed columns keep flowing, widened ints/floats are cast up,
columns *added* after start are not emitted (restart the stream to pick
them up), columns dropped after start read as null.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)

from skipmap_processor_spark.changefeed import (_LOGICAL_KINDS,
                                                _added_entries,
                                                _manifest_or_expired)
from skipmap_processor_spark.lake import LakeTable

_META_COLS = [("_change_type", "string"), ("_commit_version", "bigint")]


@dataclass
class _FeedPartition(InputPartition):
    """One immutable delta file + its rebind plan. ``plan`` rows are
    ``(src_name | None, out_name, out_type, needs_cast)`` in output-schema
    order (src None = column added to the table after this file was
    written, or dropped before stream start → nulls)."""

    file_path: str = ""
    version: int = 0
    plan: tuple = field(default_factory=tuple)


def _pa_type(name: str):
    """Arrow type for the lake's DDL type names (engine + payload types;
    the lossless-widening whitelist keeps this set closed)."""
    import pyarrow as pa

    flat = {
        "string": pa.string(), "bigint": pa.int64(), "long": pa.int64(),
        "int": pa.int32(), "integer": pa.int32(), "smallint": pa.int16(),
        "boolean": pa.bool_(), "double": pa.float64(), "float": pa.float32(),
        "date": pa.date32(), "timestamp": pa.timestamp("us"),
        "binary": pa.binary(),
    }
    n = name.strip().lower()
    if n in flat:
        return flat[n]
    if n.startswith("array<") and n.endswith(">"):
        return pa.list_(_pa_type(n[6:-1]))
    raise ValueError(f"unsupported lake column type for the feed: {name!r}")


class _FeedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("lake_changefeed requires .option('path', ...)")
        self._lake = LakeTable(None, path)  # driver-side metadata I/O only
        mani = self._lake.manifest()
        mode = mani["properties"].get("merge_mode")
        if mode != "mor":
            raise ValueError(
                f"lake_changefeed tails MOR tables (merge deltas ARE the "
                f"write stream); this table is merge_mode={mode!r} — use "
                "changefeed.table_changes / FeedFollower for exact net "
                "changes on CoW tables")
        start = options.get("startingversion", options.get("startingVersion"))
        self._start = int(mani["version"]) if start is None else int(start)
        self._max_versions = int(options.get("maxversionsperbatch", 0) or 0)
        # stream-pinned output schema (current table schema at start)
        self._out_cols = [(c["id"], c["name"], c["type"])
                          for c in self._lake.current_schema(mani)]
        self._last_end: int | None = None

    # -------------------------------------------------- offsets (driver)

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        latest = self._lake._latest_version()
        floor = self._last_end if self._last_end is not None else self._start
        if self._max_versions and latest > floor + self._max_versions:
            latest = floor + self._max_versions
        self._last_end = max(floor, latest)
        return {"version": self._last_end}

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass

    # ----------------------------------------------- partitions (driver)

    def _plan_for(self, mani: dict, schema_version: int) -> tuple:
        old = {c["id"]: c for c in mani["schemas"][str(schema_version)]}
        plan = []
        for cid, name, typ in self._out_cols:
            oc = old.get(cid)
            plan.append((
                oc["name"] if oc else None, name, typ,
                bool(oc) and oc["type"] != typ,
            ))
        return tuple(plan)

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        sv_, ev_ = int(start["version"]), int(end["version"])
        if self._last_end is None or ev_ > self._last_end:
            self._last_end = ev_  # restart path: resume the cap from here
        parts: list[InputPartition] = []
        plans: dict[int, tuple] = {}
        for v in range(sv_ + 1, ev_ + 1):
            mani = _manifest_or_expired(self._lake, v)
            if mani.get("commit_kind", None) not in _LOGICAL_KINDS:
                continue
            for fe in _added_entries(self._lake, v - 1, v):
                sv = int(fe["schema_version"])
                if sv not in plans:
                    plans[sv] = self._plan_for(mani, sv)
                parts.append(_FeedPartition(
                    file_path=os.path.join(self._lake.path, fe["path"]),
                    version=v, plan=plans[sv]))
        return parts

    # ------------------------------------------------- read (executors)

    def read(self, partition: _FeedPartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.file_path)
        n = tbl.num_rows
        cols, names = [], []
        for src, out, typ, needs_cast in partition.plan:
            target = _pa_type(typ)
            if src is None or src not in tbl.column_names:
                col = pa.nulls(n, type=target)
            else:
                col = tbl.column(src)
                if needs_cast or not col.type.equals(target):
                    col = pc.cast(col, target)
            cols.append(col)
            names.append(out)
        is_deleted = tbl.column("is_deleted")
        cols.append(pc.if_else(is_deleted, pa.scalar("delete"),
                               pa.scalar("upsert")))
        names.append("_change_type")
        cols.append(pa.array([partition.version] * n, pa.int64()))
        names.append("_commit_version")
        yield from pa.Table.from_arrays(cols, names=names).to_batches()


class LakeChangefeedDataSource(DataSource):
    """Streaming (and one-shot batch) reader for a LakeTable's change feed.

    Register once per session, then ``spark.readStream.format(
    "lake_changefeed")``. Options: ``path`` (required),
    ``startingVersion`` (default: table version at stream start — tail
    only new commits; 0 = full history), ``maxVersionsPerBatch``
    (bound a catch-up micro-batch; 0 = unbounded).
    """

    @classmethod
    def name(cls) -> str:
        return "lake_changefeed"

    def schema(self) -> str:
        # runs in a sessionless Python worker: build a DDL string by hand
        # (StructType construction needs an active SparkContext to parse
        # type names)
        path = self.options.get("path")
        if not path:
            raise ValueError("lake_changefeed requires .option('path', ...)")
        with open(os.path.join(path, "_VERSION")) as f:
            v = int(f.read().strip())
        with open(os.path.join(path, "manifests", f"v{v}.json")) as f:
            mani = json.load(f)
        cols = [(c["name"], c["type"])
                for c in mani["schemas"][str(mani["schema_version"])]]
        return ", ".join(f"{n} {t}" for n, t in cols + _META_COLS)

    def streamReader(self, schema) -> _FeedStreamReader:
        return _FeedStreamReader(dict(self.options))


def register_feed_source(spark) -> None:
    spark.dataSource.register(LakeChangefeedDataSource)
