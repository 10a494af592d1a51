"""TableFormat — the catalog/format seam under the CDC engine.

``streaming/pipeline.py`` and the replay drivers address the lake through
exactly this surface (epoch gate + HWM, schema evolution, MERGE, ledger,
maintenance). ``LakeTable`` satisfies it structurally; a real catalog
swap (Iceberg/Delta/Nessie) implements the same protocol — the engine
above the seam does not change. This makes the prose promise of lake.py's
module docstring ("swap the POSIX CAS for a real catalog") code:
``open_table`` dispatches on a URI scheme, and ``IcebergTableFormat``
maps every op onto Iceberg SQL (DDL + MERGE INTO) for runtimes that ship
the iceberg-spark extension. No Iceberg jars exist in this sandbox, so
IcebergTableFormat fails loudly at construction unless a matching Spark
catalog is configured; its SQL *generation* is pure and unit-tested.

Reference op this seam mirrors: the SQL-surfaced upsert the reference
drives through Postgres (/root/reference/src/io/PostGISDataStore.ts:829-850).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession

from skipmap_processor_spark.lake import KEY_COLS, LakeTable


@runtime_checkable
class TableFormat(Protocol):
    """The surface the CDC engine requires of a table format.

    Data plane: ``read`` (snapshot, LWW-resolved), ``merge_batch``
    (ord-gated keyed MERGE of a deduped action batch, atomic with the
    epoch high-water mark). Control plane: exactly-once epoch gate,
    schema evolution by field id, compaction/retention. LakeTable
    implements this over bucketed parquet + a filesystem catalog;
    IcebergTableFormat over an Iceberg catalog."""

    # --- data plane
    def read(self, buckets: list[int] | None = None,
             include_deleted: bool = False,
             with_engine_cols: bool = False,
             version: int | None = None) -> DataFrame: ...

    def merge_batch(self, actions: DataFrame, epoch: int | None,
                    **kwargs) -> dict: ...

    # --- exactly-once epoch gate
    def epoch_applied(self, epoch: int) -> bool: ...

    @property
    def hwm_epoch(self) -> int: ...

    # --- schema evolution (metadata-only, field-id semantics)
    def add_column(self, name: str, dtype: str = "string",
                   src_key: str | None = None) -> bool: ...

    def rename_column(self, old: str, new: str) -> bool: ...

    def drop_column(self, name: str) -> bool: ...

    def payload_name_map(self, mani: dict | None = None) -> dict[str, str]: ...

    # --- maintenance
    def compact(self, **kwargs) -> dict: ...


def open_table(spark: SparkSession, uri: str) -> TableFormat:
    """Format dispatch by URI scheme.

    - ``lake:///abs/path`` (or a bare path) -> LakeTable on that directory
    - ``iceberg://catalog.db.table``        -> IcebergTableFormat
    """
    if uri.startswith("iceberg://"):
        return IcebergTableFormat(spark, uri[len("iceberg://"):])
    if uri.startswith("lake://"):
        uri = uri[len("lake://"):]
    return LakeTable.load(spark, uri)


# --------------------------------------------------------------------------
# Iceberg adapter: same protocol, ops mapped onto Iceberg SQL
# --------------------------------------------------------------------------

_EPOCH_PROP = "skipmap.hwm_epoch"


def iceberg_merge_sql(target: str, source_view: str,
                      payload_cols: list[str]) -> str:
    """The canonical CDC upsert as Iceberg ``MERGE INTO`` text (pure
    generation — unit-testable without jars). Ord gating mirrors
    lake.merge_batch: a matched row only changes when the source ord
    (commit, event_seq) is strictly newer; deletes win as deletes."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in KEY_COLS)
    newer = ("(s.commit > t.commit OR "
             "(s.commit = t.commit AND s.event_seq > t.event_seq))")
    set_cols = ["commit", "event_seq"] + list(payload_cols)
    sets = ", ".join(f"t.{c} = s.{c}" for c in set_cols)
    ins_cols = KEY_COLS + set_cols
    ins = ", ".join(ins_cols)
    vals = ", ".join(f"s.{c}" for c in ins_cols)
    return (
        f"MERGE INTO {target} t\n"
        f"USING {source_view} s\n"
        f"ON {on}\n"
        f"WHEN MATCHED AND s.op = 'delete' AND {newer} THEN DELETE\n"
        f"WHEN MATCHED AND {newer} THEN UPDATE SET {sets}\n"
        f"WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT ({ins}) "
        f"VALUES ({vals})"
    )


class IcebergTableFormat:
    """TableFormat over a real Iceberg catalog (iceberg-spark extension).

    Every op is Iceberg SQL: MERGE INTO for the upsert, ALTER TABLE for
    schema evolution, table properties for the epoch HWM (committed in the
    same Spark action group as the merge — Iceberg's snapshot properties
    would make this fully atomic via a single commit when driven through
    the Java API; the SQL surface approximates with property-then-merge
    ordering and idempotent replay). This class cannot run in the build
    sandbox (no Iceberg jars); construction verifies the catalog exists
    and raises with setup guidance otherwise."""

    def __init__(self, spark: SparkSession, identifier: str):
        self.spark = spark
        self.identifier = identifier
        catalog = identifier.split(".", 1)[0]
        try:
            impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
        except Exception:
            impl = None
        if not impl:
            raise RuntimeError(
                f"no Spark catalog {catalog!r} configured — Iceberg tables "
                "need the iceberg-spark runtime jar and "
                f"spark.sql.catalog.{catalog}=org.apache.iceberg.spark."
                "SparkCatalog (plus warehouse/uri settings). This sandbox "
                "ships no Iceberg jars; use lake:// (LakeTable) instead."
            )

    # --- data plane
    def read(self, buckets=None, include_deleted=False,
             with_engine_cols=False, version=None) -> DataFrame:
        tbl = self.identifier
        if version is not None:
            tbl = f"{tbl} VERSION AS OF {int(version)}"
        return self.spark.sql(f"SELECT * FROM {tbl}")  # pragma: no cover

    def merge_batch(self, actions: DataFrame, epoch: int | None,
                    **kwargs) -> dict:  # pragma: no cover - needs jars
        if epoch is not None and self.epoch_applied(epoch):
            return {"skipped": True, "epoch": epoch,
                    "hwm_epoch": self.hwm_epoch}
        payload = [c for c in actions.columns
                   if c not in KEY_COLS + ["commit", "event_seq", "op"]]
        view = f"_src_{abs(hash(self.identifier)) % 10 ** 8}"
        actions.createOrReplaceTempView(view)
        self.spark.sql(iceberg_merge_sql(self.identifier, view, payload))
        if epoch is not None:
            self.spark.sql(
                f"ALTER TABLE {self.identifier} SET TBLPROPERTIES "
                f"('{_EPOCH_PROP}'='{int(epoch)}')")
        return {"skipped": False, "epoch": epoch}

    # --- epoch gate
    @property
    def hwm_epoch(self) -> int:  # pragma: no cover - needs jars
        rows = self.spark.sql(
            f"SHOW TBLPROPERTIES {self.identifier} ('{_EPOCH_PROP}')"
        ).collect()
        try:
            return int(rows[0]["value"])
        except (IndexError, ValueError):
            return -1

    def epoch_applied(self, epoch: int) -> bool:  # pragma: no cover
        return epoch <= self.hwm_epoch

    # --- schema evolution
    def add_column(self, name, dtype="string",
                   src_key=None) -> bool:  # pragma: no cover - needs jars
        self.spark.sql(f"ALTER TABLE {self.identifier} "
                       f"ADD COLUMN {name} {dtype}")
        return True

    def rename_column(self, old, new) -> bool:  # pragma: no cover
        self.spark.sql(f"ALTER TABLE {self.identifier} "
                       f"RENAME COLUMN {old} TO {new}")
        return True

    def drop_column(self, name) -> bool:  # pragma: no cover
        self.spark.sql(f"ALTER TABLE {self.identifier} DROP COLUMN {name}")
        return True

    def payload_name_map(self, mani=None) -> dict[str, str]:  # pragma: no cover
        cols = [f.name for f in
                self.spark.table(self.identifier).schema.fields]
        skip = set(KEY_COLS + ["commit", "event_seq", "is_deleted", "_epoch"])
        return {c: c for c in cols if c not in skip}

    # --- maintenance
    def compact(self, **kwargs) -> dict:  # pragma: no cover - needs jars
        self.spark.sql(
            f"CALL {self.identifier.split('.', 1)[0]}.system.rewrite_data_"
            f"files(table => '{self.identifier.split('.', 1)[1]}')")
        return {}
