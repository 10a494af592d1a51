"""Admin CLI: every maintenance command routes to the right engine call,
prints parseable JSON, and mutates (or refuses to mutate) exactly as the
underlying API does. Runs in-process via admin.main(argv) — the spark
session is the shared test fixture (get_spark returns the active one)."""

from __future__ import annotations

import json
import os

import pytest

from skipmap_processor_spark import admin
from skipmap_processor_spark.lake import LakeTable


def _mk_actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, op string, "
        "lang string, content string, content_sha string",
    )


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 24


@pytest.fixture()
def lake_path(spark, warehouse):
    p = os.path.join(warehouse, "t")
    t = LakeTable.create(spark, p, num_buckets=4, merge_mode="mor")
    for e in range(3):
        t.merge_batch(_mk_actions(spark, [
            ("r1", f"f{i}.py", c(e * 100 + i), 0, "upsert", "go", f"b{e}", "s")
            for i in range(10)]), epoch=e)
    return p


def _run(capsys, argv) -> tuple[int, dict]:
    rc = admin.main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, json.loads(out[-1])


def test_fsck_history_stats(lake_path, spark, capsys):
    rc, rep = _run(capsys, ["fsck", "--lake", lake_path, "--footers"])
    assert rc == 0 and rep["ok"] and rep["checked_files"] >= 3

    rc, hist = _run(capsys, ["history", "--lake", lake_path, "--limit", "2"])
    assert rc == 0 and len(hist["history"]) == 2
    assert hist["history"][0]["version"] > hist["history"][1]["version"]

    rc, st = _run(capsys, ["stats", "--lake", lake_path])
    assert rc == 0 and st["total_rows"] == 30

    # fsck exit code is 1 on findings (scriptable gate)
    lake = LakeTable.load(spark, lake_path)
    os.remove(os.path.join(lake.path, lake.file_entries()[0]["path"]))
    rc, rep = _run(capsys, ["fsck", "--lake", lake_path])
    assert rc == 1 and not rep["ok"]


def test_compact_vacuum_rescale_tag(lake_path, spark, capsys):
    rc, plan = _run(capsys, ["compact", "--lake", lake_path, "--plan-only"])
    assert rc == 0 and "buckets" in plan

    rc, comp = _run(capsys, ["compact", "--lake", lake_path])
    assert rc == 0

    rc, vac = _run(capsys, ["vacuum", "--lake", lake_path, "--keep", "1",
                            "--grace", "0"])
    assert rc == 0 and vac["manifests"] >= 1

    rc, res = _run(capsys, ["rescale", "--lake", lake_path, "--to", "8"])
    assert rc == 0
    assert LakeTable.load(spark, lake_path).manifest()["num_buckets"] == 8

    rc, tag = _run(capsys, ["tag", "--lake", lake_path, "--create", "rel"])
    assert rc == 0 and tag["name"] == "rel"
    rc, refs = _run(capsys, ["tag", "--lake", lake_path])
    assert rc == 0 and "rel" in refs["refs"]
    rc, dele = _run(capsys, ["tag", "--lake", lake_path, "--delete", "rel"])
    assert rc == 0 and dele["deleted"]


def test_sql_dml_routes(lake_path, spark, capsys):
    rc, stats = _run(capsys, [
        "sql", "--lake", lake_path,
        "DELETE FROM lake WHERE path = 'f0.py'"])
    assert rc == 0 and not stats.get("skipped")
    t = LakeTable.load(spark, lake_path)
    assert t.read().filter("path = 'f0.py'").count() == 0

    rc, stats = _run(capsys, [
        "sql", "--lake", lake_path, "--name", "code",
        "UPDATE code SET lang = 'rs' WHERE path = 'f1.py'"])
    assert rc == 0
    rows = t.read().select("path", "lang").collect()
    assert all((r.lang == "rs") == (r.path == "f1.py") for r in rows)

    rc, r = _run(capsys, [
        "sql", "--lake", lake_path,
        "ALTER TABLE lake ADD COLUMN stars bigint"])
    assert rc == 0 and r == {"action": "add", "column": "stars",
                             "applied": True}
    assert "stars" in LakeTable.load(spark, lake_path).read().columns

    with pytest.raises(SystemExit):
        admin.main(["sql", "--lake", lake_path, "SELECT 1"])
    capsys.readouterr()
