"""Jar-gated Iceberg integration (VERDICT r4 item 7).

The sandbox ships no Iceberg jars, so the integration drive SKIPS cleanly
here — the day a runtime with iceberg-spark-runtime on the classpath runs
this suite, it lights up with zero code changes: a real Iceberg table is
created in a local hadoop catalog, `IcebergTableFormat.merge_batch` +
`epoch_applied` replay one epoch stream (insert/update/delete +
redelivery), and the final table state is asserted row-equal with
LakeTable replaying the same events.

The drive runs in a subprocess because the Iceberg extension + catalog
must be configured at SparkSession build time, and the test session's JVM
is shared across the suite.

Structural validity of the SQL the adapter would submit is NOT jar-gated:
`iceberg_merge_sql` output round-trips through sql_merge's parser (and
executes with lake semantics in test_formats_sql.py) below.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from skipmap_processor_spark.formats import iceberg_merge_sql
from skipmap_processor_spark.sql_merge import _MERGE_RE, _norm, _parse_on

ICEBERG_EXT = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Standalone drive: parity between IcebergTableFormat and LakeTable over
# the same event batches, exactly-once gate included.
_DRIVE = r"""
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

warehouse = sys.argv[1]

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.extensions", "{ext}")
    .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.local.type", "hadoop")
    .config("spark.sql.catalog.local.warehouse", warehouse + "/iceberg")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)

from skipmap_processor_spark.formats import IcebergTableFormat
from skipmap_processor_spark.lake import LakeTable

spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")
spark.sql(
    "CREATE TABLE local.db.code (repo string, path string, commit string, "
    "event_seq bigint, lang string, content string, content_sha string) "
    "USING iceberg"
)
ice = IcebergTableFormat(spark, "local.db.code")

def batch(rows):
    df = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, "
        "op string, lang string, content string",
    )
    return df.withColumn("content_sha", F.lower(F.sha2(F.coalesce(
        F.col("content"), F.lit("")), 256)))

b0 = batch([
    ("r1", "a.py", "c01", 1, "insert", "py", "print(1)"),
    ("r1", "b.py", "c01", 2, "insert", "py", "print(2)"),
    ("r2", "x.go", "c02", 1, "insert", "go", "package x"),
])
b1 = batch([
    ("r1", "a.py", "c03", 1, "update", "py", "print(1+1)"),
    ("r1", "b.py", "c03", 2, "delete", "py", None),
    ("r2", "y.go", "c03", 3, "insert", "go", "package y"),
    ("r1", "a.py", "c02", 9, "update", "py", "STALE - ord gate must drop"),
])

assert ice.hwm_epoch == -1 and not ice.epoch_applied(0)
ice.merge_batch(b0, epoch=0)
assert ice.epoch_applied(0) and ice.hwm_epoch == 0
ice.merge_batch(b1, epoch=1)
assert ice.epoch_applied(1)
redo = ice.merge_batch(b1, epoch=1)          # exactly-once: redelivery no-op
assert redo["skipped"], redo

lake = LakeTable.create(spark, warehouse + "/lake", num_buckets=4)
lake.merge_batch(b0, epoch=0)
lake.merge_batch(b1, epoch=1)

cols = ["repo", "path", "commit", "event_seq", "lang", "content",
        "content_sha"]
ice_rows = sorted(tuple(r) for r in ice.read().select(*cols).collect())
lake_rows = sorted(tuple(r) for r in lake.read().select(*cols).collect())
assert ice_rows == lake_rows, (ice_rows, lake_rows)
assert len(ice_rows) == 3                      # b.py deleted, a.py updated
assert [r for r in ice_rows if r[1] == "a.py"][0][2] == "c03"  # not STALE
print("ICEBERG_PARITY_OK")
""".format(ext=ICEBERG_EXT)


def _iceberg_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_EXT)
        return True
    except Exception:
        return False


def test_iceberg_merge_parity_jar_gated(spark, tmp_path):
    if not _iceberg_on_classpath(spark):
        pytest.skip("iceberg-spark runtime jar not on the classpath — "
                    "drive lights up when a deployment ships it")
    script = tmp_path / "iceberg_drive.py"
    script.write_text(_DRIVE)
    env = dict(os.environ, PYTHONPATH=REPO_ROOT)
    out = subprocess.run(
        [sys.executable, str(script), str(tmp_path)],
        capture_output=True, text=True, timeout=540, env=env,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    assert "ICEBERG_PARITY_OK" in out.stdout


def test_iceberg_merge_sql_roundtrips_through_parser():
    """Every payload shape the adapter can emit parses as the canonical
    ord-gated LWW upsert: target/aliases/ON keys recovered, delete branch
    guarded, update+insert branches present — the same grammar
    execute_merge_into enforces before running with lake semantics."""
    for payload in (["lang", "content"],
                    ["lang", "content", "content_sha"],
                    ["language", "branch", "content", "content_sha"]):
        sql = iceberg_merge_sql("cat.db.code", "src_view", payload)
        m = _MERGE_RE.match(_norm(sql))
        assert m, sql
        assert m.group("target") == "cat.db.code"
        assert m.group("source") == "src_view"
        keys = _parse_on(m.group("on"), m.group("talias"),
                         m.group("salias"))
        assert sorted(keys) == ["path", "repo"]
        clauses = m.group("clauses").upper()
        assert "WHEN MATCHED AND S.OP = 'DELETE'" in clauses
        assert "THEN UPDATE SET" in clauses and "THEN INSERT" in clauses
        for c in payload:
            assert f"t.{c} = s.{c}" in sql
