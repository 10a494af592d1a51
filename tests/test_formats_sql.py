"""TableFormat seam + MERGE INTO SQL surface (VERDICT r3 item 4).

The engine drives tables through the TableFormat protocol; LakeTable
satisfies it structurally, the Iceberg adapter maps the same ops onto
Iceberg SQL (construction fails loudly without jars), and the canonical
MERGE INTO text executes against LakeTable with lake semantics (ord gate,
tombstones, epoch exactly-once)."""

from __future__ import annotations

import os

import pytest

from skipmap_processor_spark.formats import (
    IcebergTableFormat,
    TableFormat,
    iceberg_merge_sql,
    open_table,
)
from skipmap_processor_spark.lake import LakeTable
from skipmap_processor_spark.sql_merge import execute_merge_into


def _mk_actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, "
        "op string, lang string, content string, content_sha string",
    )


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 24


def test_laketable_satisfies_tableformat_protocol(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "fmt"), num_buckets=4)
    assert isinstance(t, TableFormat)
    # open_table dispatch: bare path and lake:// both land on LakeTable
    assert isinstance(open_table(spark, t.path), LakeTable)
    assert isinstance(open_table(spark, f"lake://{t.path}"), LakeTable)


def test_iceberg_adapter_requires_catalog(spark):
    with pytest.raises(RuntimeError, match="iceberg-spark"):
        IcebergTableFormat(spark, "ice.db.tbl")
    with pytest.raises(RuntimeError, match="iceberg-spark"):
        open_table(spark, "iceberg://ice.db.tbl")


def test_iceberg_merge_sql_text():
    sql = iceberg_merge_sql("cat.db.code", "src", ["lang", "content"])
    assert "MERGE INTO cat.db.code t" in sql
    assert "USING src s" in sql
    assert "ON t.repo = s.repo AND t.path = s.path" in sql
    assert "WHEN MATCHED AND s.op = 'delete'" in sql and "THEN DELETE" in sql
    # ord gate present in both mutation branches
    assert sql.count("s.commit > t.commit") == 2
    assert "WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT" in sql


def test_merge_into_sql_executes_with_lake_semantics(spark, warehouse):
    """The exact canonical statement (iceberg_merge_sql text) drives
    LakeTable.merge_batch: upsert, ord-gated stale dup, tombstone delete,
    epoch exactly-once."""
    t = LakeTable.create(spark, os.path.join(warehouse, "sqlm"),
                         num_buckets=4, merge_mode="mor")
    tables = {"code": t}
    sql = iceberg_merge_sql("code", "batch0", ["lang", "content",
                                               "content_sha"])
    _mk_actions(spark, [
        ("r1", "a.py", c(2), 0, "upsert", "py", "v2", "s2"),
        ("r1", "b.py", c(1), 0, "upsert", "py", "v1", "s1"),
    ]).createOrReplaceTempView("batch0")
    stats = execute_merge_into(spark, sql, tables, epoch=0)
    assert not stats["skipped"]
    got = {r["path"]: r["content"] for r in t.read().collect()}
    assert got == {"a.py": "v2", "b.py": "v1"}

    # stale duplicate (older ord) + delete via the same SQL text
    sql1 = iceberg_merge_sql("code", "batch1", ["lang", "content",
                                                "content_sha"])
    _mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "py", "STALE", "sX"),
        ("r1", "b.py", c(3), 0, "delete", None, None, None),
    ]).createOrReplaceTempView("batch1")
    execute_merge_into(spark, sql1, tables, epoch=1)
    got = {r["path"]: r["content"] for r in t.read().collect()}
    assert got == {"a.py": "v2"}, "stale dup rejected, b.py tombstoned"

    # exactly-once: replaying epoch 1 is a no-op
    assert execute_merge_into(spark, sql1, tables, epoch=1)["skipped"]


def test_merge_into_rejects_foreign_semantics(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "sqlr"),
                         num_buckets=4)
    tables = {"code": t}
    base = ("MERGE INTO code t USING v s ON {on} "
            "WHEN MATCHED THEN UPDATE SET t.content = s.content "
            "WHEN NOT MATCHED THEN INSERT (repo, path) VALUES "
            "(s.repo, s.path)")
    # non-key ON clause
    with pytest.raises(ValueError, match="ON"):
        execute_merge_into(
            spark, base.format(on="t.repo = s.repo AND t.lang = s.lang"),
            tables)
    # unguarded MATCHED DELETE
    with pytest.raises(ValueError, match="delete"):
        execute_merge_into(
            spark,
            "MERGE INTO code t USING v s ON t.repo = s.repo AND "
            "t.path = s.path WHEN MATCHED THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET t.content = s.content "
            "WHEN NOT MATCHED THEN INSERT (repo) VALUES (s.repo)",
            tables)
    # missing INSERT branch
    with pytest.raises(ValueError, match="INSERT"):
        execute_merge_into(
            spark,
            "MERGE INTO code t USING v s ON t.repo = s.repo AND "
            "t.path = s.path WHEN MATCHED THEN UPDATE SET "
            "t.content = s.content",
            tables)
    # unknown target
    with pytest.raises(ValueError, match="unknown target"):
        execute_merge_into(
            spark, base.format(on="t.repo = s.repo AND t.path = s.path"),
            {"other": t})


# --------------------------------------------- CREATE MATERIALIZED VIEW SQL

def test_create_materialized_view_sql_maintains(spark, warehouse, tmp_path):
    """The SQL view declaration maps onto IncrementalView's full
    maintainable-aggregate set and refreshes incrementally, matching a
    from-scratch Spark aggregation oracle (COUNT(expr) non-null
    semantics included via a null lang row)."""
    from pyspark.sql import functions as F

    from skipmap_processor_spark.sql_merge import create_materialized_view

    t = LakeTable.create(spark, os.path.join(warehouse, "cmv"),
                         num_buckets=4, merge_mode="mor")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "aaaa", "s1"),
        ("r1", "b.go", c(1), 1, "upsert", "go", "bb", "s2"),
        ("r1", "c.sh", c(1), 2, "upsert", None, "cccccc", "s3"),
        ("r2", "d.rs", c(1), 3, "upsert", "rust", "dd", "s4"),
    ]), epoch=0)
    view = create_materialized_view(
        spark,
        """CREATE MATERIALIZED VIEW repo_stats AS
           SELECT repo, COUNT(*) AS n, COUNT(lang) AS n_langed,
                  SUM(length(content)) AS b, MAX(length(content)) AS mx,
                  COUNT(DISTINCT lang) AS nl
           FROM code GROUP BY repo""",
        tables={"code": t}, views_root=str(tmp_path))
    assert view.refresh()["mode"] == "full"

    def oracle():
        return {
            r["repo"]: (r["n"], r["n_langed"], r["b"], r["mx"], r["nl"])
            for r in t.read().groupBy("repo").agg(
                F.count(F.lit(1)).alias("n"),
                F.count("lang").alias("n_langed"),
                F.sum(F.length("content")).alias("b"),
                F.max(F.length("content")).alias("mx"),
                F.countDistinct("lang").alias("nl")).collect()
        }

    def got():
        return {r["repo"]: (r["n"], r["n_langed"], r["b"], r["mx"], r["nl"])
                for r in view.read().collect()}

    assert got() == oracle()
    # churn: delete the max holder + the only go row, null->real lang
    t.merge_batch(_mk_actions(spark, [
        ("r1", "c.sh", c(2), 0, "upsert", "shell", "c", "s5"),
        ("r1", "b.go", c(2), 1, "delete", None, None, None),
    ]), epoch=1)
    assert view.refresh()["mode"] == "incremental"
    assert got() == oracle()
    # state lives under views_root/<name>
    assert os.path.isdir(os.path.join(str(tmp_path), "repo_stats"))


def test_create_materialized_view_sql_rejects_unmaintainable(
        spark, warehouse, tmp_path):
    from skipmap_processor_spark.sql_merge import create_materialized_view

    t = LakeTable.create(spark, os.path.join(warehouse, "cmvr"),
                         num_buckets=4)
    tb = {"code": t}
    root = str(tmp_path)
    with pytest.raises(ValueError, match="AVG"):
        create_materialized_view(
            spark, "CREATE MATERIALIZED VIEW v AS SELECT repo, "
            "AVG(length(content)) AS a FROM code GROUP BY repo",
            tables=tb, views_root=root)
    with pytest.raises(ValueError, match="not in GROUP BY"):
        create_materialized_view(
            spark, "CREATE MATERIALIZED VIEW v AS SELECT lang, "
            "COUNT(*) AS n FROM code GROUP BY repo",
            tables=tb, views_root=root)
    with pytest.raises(ValueError, match="missing from SELECT"):
        create_materialized_view(
            spark, "CREATE MATERIALIZED VIEW v AS SELECT COUNT(*) AS n "
            "FROM code GROUP BY repo",
            tables=tb, views_root=root)
    with pytest.raises(ValueError, match="DISTINCT is only"):
        create_materialized_view(
            spark, "CREATE MATERIALIZED VIEW v AS SELECT repo, "
            "SUM(DISTINCT length(content)) AS s FROM code GROUP BY repo",
            tables=tb, views_root=root)
    with pytest.raises(ValueError, match="alias|supported select item"):
        create_materialized_view(
            spark, "CREATE MATERIALIZED VIEW v AS SELECT repo, COUNT(*) "
            "FROM code GROUP BY repo",
            tables=tb, views_root=root)
    with pytest.raises(ValueError, match="unknown target"):
        create_materialized_view(
            spark, "CREATE MATERIALIZED VIEW v AS SELECT repo, COUNT(*) "
            "AS n FROM nope GROUP BY repo",
            tables=tb, views_root=root)


# --------------------------------------------------- ALTER TABLE DDL SQL

def test_alter_table_ddl_sql(spark, warehouse):
    """All four DDL shapes dispatch to the metadata-only evolution APIs;
    data written before a rename stays readable under the new name (field
    id rebind) and widen rejects narrowing."""
    from skipmap_processor_spark.sql_merge import execute_alter_table

    t = LakeTable.create(spark, os.path.join(warehouse, "ddl"),
                         num_buckets=4, merge_mode="mor")
    t.merge_batch(_mk_actions(spark, [
        ("r1", "a.py", c(1), 0, "upsert", "python", "aa", "s1"),
    ]), epoch=0)
    tb = {"code": t}

    r = execute_alter_table(
        "ALTER TABLE code ADD COLUMN stars bigint", tables=tb)
    assert r == {"action": "add", "column": "stars", "applied": True}
    # idempotent: second add is a no-op
    assert not execute_alter_table(
        "ALTER TABLE code ADD COLUMN stars bigint", tables=tb)["applied"]
    assert execute_alter_table(
        "ALTER TABLE code RENAME COLUMN lang TO language",
        tables=tb)["applied"]
    assert t.read().select("language").collect()[0][0] == "python"
    assert execute_alter_table(
        "ALTER TABLE code DROP COLUMN stars", tables=tb)["applied"]
    assert "stars" not in t.read().columns
    with pytest.raises(ValueError, match="engine column"):
        execute_alter_table("ALTER TABLE code DROP COLUMN repo", tables=tb)
    # widen path: add an int col then promote to bigint; narrowing raises
    execute_alter_table("ALTER TABLE code ADD COLUMN forks int", tables=tb)
    assert execute_alter_table(
        "ALTER TABLE code ALTER COLUMN forks TYPE bigint",
        tables=tb)["applied"]
    with pytest.raises(ValueError, match="non-widening"):
        execute_alter_table("ALTER TABLE code ALTER COLUMN forks TYPE int",
                            tables=tb)
    with pytest.raises(ValueError, match="unsupported ALTER TABLE"):
        execute_alter_table("ALTER TABLE code SET TBLPROPERTIES x", tables=tb)


def test_create_materialized_view_rejects_alias_collisions(
        spark, warehouse, tmp_path):
    from skipmap_processor_spark.sql_merge import create_materialized_view

    t = LakeTable.create(spark, os.path.join(warehouse, "cmva"),
                         num_buckets=4)
    tb, root = {"code": t}, str(tmp_path)
    with pytest.raises(ValueError, match="duplicate alias"):
        create_materialized_view(
            spark, "CREATE MATERIALIZED VIEW v AS SELECT repo, COUNT(*) "
            "AS n, SUM(length(content)) AS n FROM code GROUP BY repo",
            tables=tb, views_root=root)
    with pytest.raises(ValueError, match="shadows"):
        create_materialized_view(
            spark, "CREATE MATERIALIZED VIEW v AS SELECT repo, COUNT(*) "
            "AS repo FROM code GROUP BY repo",
            tables=tb, views_root=root)
