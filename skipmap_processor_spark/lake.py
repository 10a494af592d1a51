"""LakeTable — a versioned, hash-bucketed, parquet-backed keyed table.

No Iceberg/Delta jars ship in this sandbox, so the engine carries its own
thin lake layer with the same *scale-relevant* properties Iceberg would give
us (and the same ones the reference gets from Postgres ``ON CONFLICT``
upserts, /root/reference/src/io/PostGISDataStore.ts:829-850):

- **Bucket layout**: rows are hash-bucketed by ``xxhash64(repo, path) % B``.
  A MERGE touches only the buckets its batch keys hash into; every other
  bucket's files are carried forward by reference in the new manifest —
  copy-on-write limited to affected files, exactly like Iceberg CoW MERGE
  with ``PARTITIONED BY (bucket(B, key))``. At 100 TB you raise B (e.g.
  4096); the rewrite cost per epoch stays proportional to the batch's key
  spread, not to table size.
- **Atomic snapshot commits**: a manifest (JSON) lists data files + schema +
  properties; ``_VERSION`` is an atomically-replaced pointer. Readers always
  see a consistent snapshot; a crash mid-commit leaves only orphan data
  files. Time travel = read an older manifest.
- **Exactly-once epochs**: the applied-epoch high-water mark lives in the
  manifest *properties* and therefore commits atomically with the data —
  replaying a delivered epoch is a metadata-level no-op (mirrors the
  reference's gap-fill ledger,
  /root/reference/snow-cover/src/snow_cover_sqlite_archive.py:125-155).
- **Schema evolution by field id**: columns carry stable integer field ids;
  RENAME COLUMN is a metadata-only commit (old data files keep the old
  parquet column name; the read path re-binds by id), ADD COLUMN is
  metadata-only with nulls read for old files — Iceberg semantics.
- **Tombstones**: deletes keep ``(key, ord, is_deleted=true)`` rows so stale
  duplicate deliveries can never resurrect a deleted/renamed-away row.

Concurrency note: single-writer (the streaming driver). Multi-writer would
add optimistic manifest CAS + retry, like Iceberg's commit protocol.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# engine-managed columns; never renamed, fixed field ids
ENGINE_COLS = [
    (1, "repo", "string"),
    (2, "path", "string"),
    (3, "commit", "string"),
    (4, "event_seq", "bigint"),
    (5, "is_deleted", "boolean"),
    (6, "_epoch", "bigint"),
]
KEY_COLS = ["repo", "path"]
ORD_COLS = ["commit", "event_seq"]


def bucket_expr(num_buckets: int):
    """Deterministic bucket id for a key — same function on write and read."""
    return F.pmod(F.xxhash64(F.col("repo"), F.col("path")), F.lit(num_buckets))


def _schema_to_struct(cols: list[dict]) -> T.StructType:
    return T.StructType(
        [T.StructField(c["name"], T._parse_datatype_string(c["type"])) for c in cols]
    )


class LakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # ------------------------------------------------------------- lifecycle

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        payload_cols: list[tuple[str, str]] | None = None,
        num_buckets: int = 32,
        merge_mode: str = "cow",
    ) -> "LakeTable":
        """``merge_mode``:

        - ``cow`` (copy-on-write): MERGE joins the batch against affected
          buckets and rewrites them — read-optimal, write cost proportional
          to touched-bucket size.
        - ``mor`` (merge-on-read): MERGE appends one delta file per affected
          bucket (no read, no join — write cost proportional to batch size
          only); readers apply a LWW window; ``compact()`` folds deltas.
          This is the high-throughput CDC path at 10^10-event scale, exactly
          Iceberg's MOR trade.
        """
        payload_cols = payload_cols or [
            ("lang", "string"),
            ("content", "string"),
            ("content_sha", "string"),
        ]
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        cols = [
            {"id": i, "name": n, "type": t} for i, n, t in ENGINE_COLS
        ] + [
            {"id": 100 + j, "name": n, "type": t}
            for j, (n, t) in enumerate(payload_cols)
        ]
        if merge_mode not in ("cow", "mor"):
            raise ValueError(f"merge_mode must be cow|mor, got {merge_mode!r}")
        manifest = {
            "version": 0,
            "num_buckets": num_buckets,
            "key_cols": KEY_COLS,
            "schema_version": 1,
            "schemas": {"1": cols},
            "files": [],
            "properties": {
                "hwm_epoch": -1,
                "next_field_id": 100 + len(payload_cols),
                "merge_mode": merge_mode,
                "has_deltas": False,
            },
        }
        tbl = cls(spark, path)
        tbl._commit_manifest(manifest)
        return tbl

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeTable":
        tbl = cls(spark, path)
        tbl.manifest()  # raises if missing
        return tbl

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(os.path.join(path, "_VERSION"))

    # ------------------------------------------------------------- manifests

    def manifest(self, version: int | None = None) -> dict:
        if version is None:
            with open(os.path.join(self.path, "_VERSION")) as f:
                version = int(f.read().strip())
        with open(os.path.join(self.path, "manifests", f"v{version}.json")) as f:
            return json.load(f)

    def _commit_manifest(self, manifest: dict) -> None:
        v = manifest["version"]
        mpath = os.path.join(self.path, "manifests", f"v{v}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        tmp = os.path.join(self.path, f"_VERSION.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(v))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.path, "_VERSION"))  # atomic pointer swap

    @property
    def hwm_epoch(self) -> int:
        return int(self.manifest()["properties"]["hwm_epoch"])

    def current_schema(self, mani: dict | None = None) -> list[dict]:
        mani = mani or self.manifest()
        return mani["schemas"][str(mani["schema_version"])]

    def current_columns(self, mani: dict | None = None) -> list[str]:
        return [c["name"] for c in self.current_schema(mani)]

    def payload_columns(self, mani: dict | None = None) -> list[str]:
        engine = {n for _, n, _ in ENGINE_COLS}
        return [c["name"] for c in self.current_schema(mani) if c["name"] not in engine]

    # ------------------------------------------------------------- reading

    def _read_files(self, mani: dict, files: list[dict]) -> DataFrame:
        """Read data files, re-binding columns by field id to current names."""
        cur_cols = self.current_schema(mani)
        cur_by_id = {c["id"]: c for c in cur_cols}
        struct = _schema_to_struct(cur_cols)
        if not files:
            return self.spark.createDataFrame([], struct)
        out = None
        by_sv: dict[int, list[str]] = {}
        for fe in files:
            by_sv.setdefault(int(fe["schema_version"]), []).append(
                os.path.join(self.path, fe["path"])
            )
        for sv, paths in sorted(by_sv.items()):
            old_cols = mani["schemas"][str(sv)]
            df = self.spark.read.parquet(*paths)
            # rename by id: old name -> current name; drop ids gone from schema
            selects = []
            present_ids = set()
            for oc in old_cols:
                cur = cur_by_id.get(oc["id"])
                if cur is None:
                    continue
                selects.append(F.col(oc["name"]).alias(cur["name"]))
                present_ids.add(oc["id"])
            for c in cur_cols:  # columns added after this file was written
                if c["id"] not in present_ids:
                    selects.append(
                        F.lit(None).cast(c["type"]).alias(c["name"])
                    )
            df = df.select(*selects).select(*[c["name"] for c in cur_cols])
            out = df if out is None else out.unionByName(df)
        return out

    def read(
        self,
        buckets: list[int] | None = None,
        include_deleted: bool = False,
        with_engine_cols: bool = False,
        version: int | None = None,
    ) -> DataFrame:
        mani = self.manifest(version)
        files = mani["files"]
        if buckets is not None:
            bset = set(buckets)
            files = [fe for fe in files if int(fe["bucket"]) in bset]
        df = self._read_files(mani, files)
        if mani["properties"].get("has_deltas"):
            # MOR read path: LWW window resolves multi-version keys.
            # _epoch desc tie-break: verbatim duplicate deliveries landed in
            # two epochs are identical rows — pick is value-irrelevant but
            # made deterministic for engine-column reads.
            from pyspark.sql import Window

            w = Window.partitionBy(*KEY_COLS).orderBy(
                F.col("commit").desc(),
                F.col("event_seq").desc(),
                F.col("_epoch").desc(),
            )
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        if not include_deleted:
            df = df.filter(~F.col("is_deleted"))
        if not with_engine_cols:
            df = df.drop("is_deleted", "_epoch")
        return df

    def lookup(self, keys_df: DataFrame, include_deleted: bool = True) -> DataFrame:
        """Current rows for the given keys — bucket-pruned point lookup.

        Reads only the buckets the keys hash into, then left-semi joins.
        This is the distributed analog of the reference's keyed cache read
        (/root/reference/src/utils/PostgresCache.ts:209-317).
        """
        mani = self.manifest()
        nb = int(mani["num_buckets"])
        keys = keys_df.select(*KEY_COLS).distinct()
        buckets = sorted(
            r["_b"]
            for r in keys.select(bucket_expr(nb).alias("_b")).distinct().collect()
        )
        df = self.read(buckets=buckets, include_deleted=include_deleted,
                       with_engine_cols=True)
        return df.join(F.broadcast(keys), KEY_COLS, "left_semi")

    def payload_name_map(self, mani: dict | None = None) -> dict[str, str]:
        """original (schema v1 / source) field name -> current column name."""
        mani = mani or self.manifest()
        engine_ids = {i for i, _, _ in ENGINE_COLS}
        v1 = {c["id"]: c.get("src_key", c["name"]) for c in mani["schemas"]["1"]}
        out = {}
        for c in self.current_schema(mani):
            if c["id"] in engine_ids:
                continue
            orig = v1.get(c["id"], c.get("src_key", c["name"]))
            out[orig] = c["name"]
        return out

    # --------------------------------------------------------- schema evolution

    def add_column(self, name: str, dtype: str = "string",
                   src_key: str | None = None) -> bool:
        """Metadata-only ADD COLUMN; no-op if a column of that name exists."""
        mani = self.manifest()
        if name in self.current_columns(mani):
            return False
        sv = mani["schema_version"] + 1
        fid = mani["properties"]["next_field_id"]
        cols = [dict(c) for c in self.current_schema(mani)]
        cols.append(
            {"id": fid, "name": name, "type": dtype, "src_key": src_key or name}
        )
        mani["schemas"][str(sv)] = cols
        mani["schema_version"] = sv
        mani["properties"]["next_field_id"] = fid + 1
        mani["version"] += 1
        self._commit_manifest(mani)
        return True

    def rename_column(self, old: str, new: str) -> bool:
        """Metadata-only RENAME COLUMN by field id (Iceberg semantics).

        Old data files keep the old parquet column name; the read path
        re-binds by id, so sha-equality on evolved rows is preserved
        (SURVEY.md §7.3 risk 4).
        """
        mani = self.manifest()
        cur = self.current_schema(mani)
        if old not in [c["name"] for c in cur]:
            return False
        sv = mani["schema_version"] + 1
        cols = []
        for c in cur:
            c = dict(c)
            if c["name"] == old:
                c["name"] = new
            cols.append(c)
        mani["schemas"][str(sv)] = cols
        mani["schema_version"] = sv
        mani["version"] += 1
        self._commit_manifest(mani)
        return True

    # ------------------------------------------------------------- MERGE

    def merge_batch(self, actions: DataFrame, epoch: int | None,
                    files_per_bucket: int = 1,
                    affected_buckets: list[int] | None = None,
                    pre_partitioned: bool = False,
                    pre_commit_check=None) -> dict:
        """Copy-on-write MERGE of a deduped action batch, gated by epoch HWM.

        ``actions`` columns: repo, path, commit, event_seq,
        op ('upsert'|'delete'), plus current payload columns (missing ones
        are filled with nulls). One row per key (caller dedups — S8/W1).

        Semantics per key (the ord gate makes replay idempotent):
          - no target row            -> insert (tombstone row for deletes)
          - target ord >= action ord -> keep target (stale duplicate)
          - action newer + upsert    -> replace row
          - action newer + delete    -> tombstone with the delete's ord
        """
        mani = self.manifest()
        hwm = int(mani["properties"]["hwm_epoch"])
        if epoch is not None and epoch <= hwm:
            return {"skipped": True, "epoch": epoch, "hwm_epoch": hwm}

        nb = int(mani["num_buckets"])
        payload = self.payload_columns(mani)
        pay_types = {
            c["name"]: c["type"]
            for c in self.current_schema(mani)
        }
        for col in payload:
            if col not in actions.columns:
                actions = actions.withColumn(col, F.lit(None).cast(pay_types[col]))

        if mani["properties"].get("merge_mode") == "mor":
            return self._merge_mor(actions, epoch, mani, files_per_bucket,
                                   pre_partitioned, pre_commit_check)

        # affected buckets: use the caller's fused one-pass profile when
        # given (saves a job per epoch); otherwise probe, caching the action
        # batch so the Arrow normalize+sha stage doesn't run twice
        act = actions.withColumn("_bucket", bucket_expr(nb))
        persisted = False
        if affected_buckets is not None:
            affected = sorted(affected_buckets)
        else:
            act = act.persist()
            persisted = True
            affected = sorted(
                r["_bucket"] for r in act.select("_bucket").distinct().collect()
            )

        old = self.read(
            buckets=affected, include_deleted=True, with_engine_cols=True
        ).withColumn("_bucket", bucket_expr(nb))

        s = act.select(
            *KEY_COLS,
            F.col("_bucket"),
            *[F.col(c).alias(f"_s_{c}") for c in ORD_COLS + ["op"] + payload],
        )
        t = old
        j = t.join(s, KEY_COLS + ["_bucket"], "full_outer")

        batch_wins = F.col("_s_commit").isNotNull() & (
            F.col("commit").isNull()
            | (F.col("_s_commit") > F.col("commit"))
            | (
                (F.col("_s_commit") == F.col("commit"))
                & (F.col("_s_event_seq") > F.col("event_seq"))
            )
        )
        is_del = F.col("_s_op") == F.lit("delete")
        result = j.select(
            *KEY_COLS,
            F.when(batch_wins, F.col("_s_commit")).otherwise(F.col("commit")).alias("commit"),
            F.when(batch_wins, F.col("_s_event_seq")).otherwise(F.col("event_seq")).alias("event_seq"),
            F.when(batch_wins, is_del).otherwise(F.coalesce(F.col("is_deleted"), F.lit(False))).alias("is_deleted"),
            F.when(batch_wins, F.lit(-1 if epoch is None else epoch))
            .otherwise(F.col("_epoch"))
            .alias("_epoch"),
            *[
                F.when(batch_wins & is_del, F.lit(None).cast(pay_types[c]))
                .when(batch_wins, F.col(f"_s_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in payload
            ],
            F.col("_bucket"),
        )

        # files_per_bucket tasks per affected bucket (raise at scale so a hot
        # 25 GB bucket isn't one task); stable row order inside files
        # (deterministic output, reference precedent: sorted cache keys,
        # /root/reference/src/utils/PostgresCache.ts:340-344)
        fpb = max(files_per_bucket, 1)
        parts = [F.col("_bucket")]
        if fpb > 1:
            parts.append(F.pmod(F.xxhash64(F.col("path")), F.lit(fpb)))
        result = result.repartition(
            max(len(affected), 1) * fpb, *parts
        ).sortWithinPartitions("_bucket", *KEY_COLS)
        new_version = mani["version"] + 1
        rel_dir = f"data/v{new_version}"
        out_dir = os.path.join(self.path, rel_dir)
        result.write.partitionBy("_bucket").mode("overwrite").parquet(out_dir)
        if persisted:
            act.unpersist()

        new_files = self._scan_written(out_dir, mani["schema_version"])
        affected_set = set(affected)
        carried = [fe for fe in mani["files"] if int(fe["bucket"]) not in affected_set]
        mani["files"] = carried + new_files
        mani["version"] = new_version
        if epoch is not None:
            mani["properties"]["hwm_epoch"] = epoch
        # atomic: data + schema + HWM commit together
        self._commit_manifest(mani)

        stats = {
            "skipped": False,
            "epoch": -1 if epoch is None else epoch,
            "version": new_version,
            "affected_buckets": affected,
            "files_written": len(new_files),
            "rows_written": sum(fe["rows"] for fe in new_files),
            "per_bucket_rows": {fe["bucket"]: fe["rows"] for fe in new_files},
        }
        self._append_ledger(stats)
        return stats

    def _merge_mor(self, actions: DataFrame, epoch: int | None, mani: dict,
                   files_per_bucket: int = 1,
                   pre_partitioned: bool = False,
                   pre_commit_check=None) -> dict:
        """Merge-on-read: append the deduped batch as delta rows — no read of
        existing data, no join. Cost is proportional to the batch, never to
        the table. Readers resolve versions via the LWW window (read());
        compact() folds deltas back to one row per key."""
        nb = int(mani["num_buckets"])
        payload = self.payload_columns(mani)
        pay_types = {c["name"]: c["type"] for c in self.current_schema(mani)}
        is_del = F.col("op") == F.lit("delete")
        rows = actions.select(
            *KEY_COLS,
            F.col("commit"),
            F.col("event_seq").cast("bigint").alias("event_seq"),
            is_del.alias("is_deleted"),
            F.lit(-1 if epoch is None else epoch).cast("bigint").alias("_epoch"),
            *[
                F.when(is_del, F.lit(None).cast(pay_types[c]))
                .otherwise(F.col(c))
                .alias(c)
                for c in payload
            ],
            *([F.col("_bucket")] if pre_partitioned else []),
        )
        if not pre_partitioned:
            # the general path shuffles here; the fast path
            # (prepare_actions_fast) already bucket-partitioned upstream —
            # select() preserves partitioning, so this shuffle is skipped
            rows = rows.withColumn("_bucket", bucket_expr(nb))
            fpb = max(files_per_bucket, 1)
            parts = [F.col("_bucket")]
            if fpb > 1:
                parts.append(F.pmod(F.xxhash64(F.col("path")), F.lit(fpb)))
            rows = rows.repartition(nb * fpb, *parts)
            # leading _bucket keeps each bucket's rows contiguous so the
            # dynamic-partition writer's own sort is elided (outputOrdering
            # prefix match); (repo, path) next for deterministic file order
            rows = rows.sortWithinPartitions("_bucket", *KEY_COLS)
        # pre-partitioned input arrives sorted by (_bucket, _salt, repo, path)
        # from the dedup window — already deterministic and bucket-contiguous;
        # re-sorting here would add a full-width O(n log n) pass AND break
        # bucket contiguity, forcing FileFormatWriter to insert its own sort
        # (measured: two redundant sorts of content-heavy rows per epoch)

        import time as _time

        new_version = mani["version"] + 1
        out_dir = os.path.join(self.path, f"data/v{new_version}")
        _t0 = _time.monotonic()
        rows.write.partitionBy("_bucket").mode("overwrite").parquet(out_dir)
        _t1 = _time.monotonic()

        if pre_commit_check is not None and not pre_commit_check():
            # optimistic execution invalidated (e.g. renames observed in a
            # batch run through the rename-free fast path): nothing was
            # committed — the staged files are invisible without a manifest
            # entry; delete them and let the caller re-run the general path
            import shutil as _shutil

            _shutil.rmtree(out_dir, ignore_errors=True)
            return {"aborted": True, "epoch": epoch}

        new_files = self._scan_written(out_dir, mani["schema_version"])
        _t2 = _time.monotonic()
        mani["files"] = mani["files"] + new_files
        mani["version"] = new_version
        if epoch is not None:
            mani["properties"]["hwm_epoch"] = epoch
        mani["properties"]["has_deltas"] = self._any_multi_file(mani["files"])
        self._commit_manifest(mani)
        _t3 = _time.monotonic()

        stats = {
            "t_write": round(_t1 - _t0, 3),
            "t_scan": round(_t2 - _t1, 3),
            "t_commit": round(_t3 - _t2, 3),
            "skipped": False,
            "epoch": -1 if epoch is None else epoch,
            "version": new_version,
            "mode": "mor",
            "affected_buckets": sorted({fe["bucket"] for fe in new_files}),
            "files_written": len(new_files),
            "rows_written": sum(fe["rows"] for fe in new_files),
            "per_bucket_rows": {fe["bucket"]: fe["rows"] for fe in new_files},
        }
        self._append_ledger(stats)
        stats["t_ledger"] = round(_time.monotonic() - _t3, 3)
        return stats

    @staticmethod
    def _any_multi_file(files: list[dict]) -> bool:
        seen: set[int] = set()
        for fe in files:
            b = int(fe["bucket"])
            if b in seen:
                return True
            seen.add(b)
        return False

    def _scan_written(self, out_dir: str, schema_version: int) -> list[dict]:
        from concurrent.futures import ThreadPoolExecutor

        paths = []
        for bdir in sorted(os.listdir(out_dir)):
            if not bdir.startswith("_bucket="):
                continue
            b = int(bdir.split("=", 1)[1])
            for fn in sorted(os.listdir(os.path.join(out_dir, bdir))):
                if fn.endswith(".parquet"):
                    paths.append((b, os.path.join(out_dir, bdir, fn)))
        # footer reads in parallel: at 100+ files/epoch this is otherwise
        # ~0.5s of serial driver time (part of the Amdahl term)
        with ThreadPoolExecutor(max_workers=16) as ex:
            rows = list(ex.map(lambda t: pq.ParquetFile(t[1]).metadata.num_rows,
                               paths))
        return [
            {
                "path": os.path.relpath(fp, self.path),
                "bucket": b,
                "schema_version": schema_version,
                "rows": n,
            }
            for (b, fp), n in zip(paths, rows)
        ]

    # ------------------------------------------------------------- ledger

    def _append_ledger(self, stats: dict) -> None:
        """Per-partition lineage ledger (observational; the exactly-once gate
        is the manifest HWM, which commits atomically with the data)."""
        import pandas as pd
        import pyarrow as pa

        rows = [
            {
                "epoch": int(stats["epoch"]),
                "bucket": int(b),
                "rows": int(r),
                "version": int(stats["version"]),
            }
            for b, r in stats["per_bucket_rows"].items()
        ] or [
            {
                "epoch": int(stats["epoch"]),
                "bucket": -1,
                "rows": 0,
                "version": int(stats["version"]),
            }
        ]
        d = os.path.join(self.path, "_ledger")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
            os.path.join(d, f"epoch-{stats['epoch']}-{uuid.uuid4().hex[:8]}.parquet"),
        )

    def read_ledger(self) -> DataFrame:
        d = os.path.join(self.path, "_ledger")
        if not os.path.exists(d) or not os.listdir(d):
            return self.spark.createDataFrame(
                [], "epoch bigint, bucket bigint, rows bigint, version bigint"
            )
        return self.spark.read.parquet(d)

    # ------------------------------------------------------------- exports

    def export_json(self, out_dir: str) -> None:
        """Newline-delimited JSON export of the live table (reference sink:
        GeoJSON FeatureCollection, /root/reference/src/transforms/FeatureCollection.ts:1-9)."""
        self.read().write.mode("overwrite").json(out_dir)

    def export_csv(self, out_dir: str) -> None:
        """Headered CSV export (reference sink:
        /root/reference/src/transforms/CSVFormatter.ts:66-127)."""
        self.read().write.mode("overwrite").option("header", True).csv(out_dir)

    # ------------------------------------------------------------- maintenance

    def compact(self, target_files_per_bucket: int = 1) -> dict:
        """Rewrite buckets whose file count exceeds the target, folding MOR
        deltas to one LWW-resolved row per key. Tombstones are RETAINED
        (they gate stale duplicate deliveries that may still arrive).
        Analog of Iceberg rewrite_data_files; reference deferred-index
        precedent: /root/reference/src/clustering/services/DataLoader.ts:45-48."""
        mani = self.manifest()
        by_bucket: dict[int, list[dict]] = {}
        for fe in mani["files"]:
            by_bucket.setdefault(int(fe["bucket"]), []).append(fe)
        todo = {b: fs for b, fs in by_bucket.items() if len(fs) > target_files_per_bucket}
        if not todo:
            return {"compacted_buckets": 0}
        nb = int(mani["num_buckets"])
        # read() applies the LWW window when deltas exist; keep tombstones
        df = self.read(
            buckets=sorted(todo), include_deleted=True, with_engine_cols=True
        ).withColumn("_bucket", bucket_expr(nb))
        new_version = mani["version"] + 1
        rel_dir = f"data/v{new_version}-compact"
        out_dir = os.path.join(self.path, rel_dir)
        df.repartition(len(todo), "_bucket").sortWithinPartitions(
            "_bucket", *KEY_COLS
        ).write.partitionBy("_bucket").mode("overwrite").parquet(out_dir)
        new_files = self._scan_written(out_dir, mani["schema_version"])
        keep = [fe for fe in mani["files"] if int(fe["bucket"]) not in todo]
        mani["files"] = keep + new_files
        mani["version"] = new_version
        mani["properties"]["has_deltas"] = self._any_multi_file(mani["files"])
        self._commit_manifest(mani)
        return {"compacted_buckets": len(todo), "version": new_version}
