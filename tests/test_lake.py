"""LakeTable: merge semantics, bucket pruning, schema evolution, ledger."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from skipmap_processor_spark.lake import LakeTable, bucket_expr


def _mk_actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, op string, "
        "lang string, content string, content_sha string",
    )


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 24


def test_merge_upsert_delete_ordgate(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=4)
    r = t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(1), 0, "upsert", "python", "v1", "s1")]),
        epoch=0,
    )
    assert not r["skipped"]
    assert t.read().count() == 1

    # newer update wins
    t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(2), 0, "upsert", "python", "v2", "s2")]),
        epoch=1,
    )
    row = t.read().first()
    assert row["content"] == "v2"

    # stale duplicate (older ord) is a no-op even in a new epoch
    t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(1), 0, "upsert", "python", "v1", "s1")]),
        epoch=2,
    )
    assert t.read().first()["content"] == "v2"

    # delete -> tombstone retained, live view empty
    t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(3), 0, "delete", None, None, None)]),
        epoch=3,
    )
    assert t.read().count() == 0
    tomb = t.read(include_deleted=True, with_engine_cols=True).first()
    assert tomb["is_deleted"] is True and tomb["commit"] == c(3)

    # stale dup after delete cannot resurrect
    t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(2), 0, "upsert", "python", "v2", "s2")]),
        epoch=4,
    )
    assert t.read().count() == 0


def test_epoch_hwm_idempotent(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=4)
    t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s")]),
        epoch=5,
    )
    r = t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(9), 0, "upsert", "go", "v9", "s")]),
        epoch=5,
    )
    assert r["skipped"], "replayed epoch must be a metadata-level no-op"
    assert t.read().first()["content"] == "v1"
    assert t.hwm_epoch == 5


def test_bucket_pruning_carries_unaffected_files(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=8)
    rows = [(f"r{i}", f"p{i}.py", c(i + 1), 0, "upsert", "go", f"v{i}", "s")
            for i in range(40)]
    t.merge_batch(_mk_actions(spark, rows), epoch=0)
    mani0 = t.manifest()
    files0 = {fe["path"]: fe for fe in t.file_entries(mani0)}

    # single-key epoch touches exactly one bucket
    one = _mk_actions(spark, [("r0", "p0.py", c(100), 0, "upsert", "go", "vx", "s")])
    b = one.select(bucket_expr(8).alias("b")).first()["b"]
    st = t.merge_batch(one, epoch=1)
    assert st["affected_buckets"] == [b]
    mani1 = t.manifest()
    carried = [fe for fe in t.file_entries(mani1) if fe["path"] in files0]
    assert all(int(fe["bucket"]) != b for fe in carried)
    assert len(carried) == len(files0) - sum(
        1 for fe in t.file_entries(mani0) if int(fe["bucket"]) == b
    )
    assert t.read().count() == 40
    assert t.read().filter("repo='r0'").first()["content"] == "vx"


def test_schema_evolution_add_and_rename(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=4)
    t.merge_batch(
        _mk_actions(spark, [("r1", "a.py", c(1), 0, "upsert", "python", "v1", "s1")]),
        epoch=0,
    )
    assert t.add_column("branch", "string", src_key="branch")
    assert not t.add_column("branch")  # idempotent
    # old files read with null for the new column
    assert t.read().first()["branch"] is None

    assert t.rename_column("lang", "language")
    assert not t.rename_column("lang", "language")  # idempotent
    # metadata-only: data written under old name still binds by field id
    row = t.read().first()
    assert row["language"] == "python"
    assert "lang" not in t.read().columns
    # name map: original event field -> current column
    assert t.payload_name_map()["lang"] == "language"

    # new writes use new names; mixed-schema read unions correctly
    acts = spark.createDataFrame(
        [("r2", "b.py", c(2), 0, "upsert", "rust", "v2", "s2", "main")],
        "repo string, path string, commit string, event_seq bigint, op string, "
        "language string, content string, content_sha string, branch string",
    )
    t.merge_batch(acts, epoch=1)
    got = {r["repo"]: r for r in t.read().collect()}
    assert got["r1"]["language"] == "python" and got["r1"]["branch"] is None
    assert got["r2"]["language"] == "rust" and got["r2"]["branch"] == "main"


def test_schema_evolution_drop_and_readd(spark, warehouse):
    """DROP COLUMN is metadata-only; re-ADD of the same name gets a NEW
    field id, so values written under the dropped id never resurrect
    (VERDICT r3 item 6)."""
    import pytest

    t = LakeTable.create(spark, os.path.join(warehouse, "tdrop"),
                         num_buckets=4, merge_mode="mor")
    t.add_column("branch", "string")
    acts = spark.createDataFrame(
        [("r1", "a.py", c(1), 0, "upsert", "python", "v1", "s1", "main")],
        "repo string, path string, commit string, event_seq bigint, "
        "op string, lang string, content string, content_sha string, "
        "branch string")
    t.merge_batch(acts, epoch=0)
    assert t.read().first()["branch"] == "main"
    old_id = [col for col in t.current_schema()
              if col["name"] == "branch"][0]["id"]

    assert t.drop_column("branch")
    assert not t.drop_column("branch")  # idempotent
    assert "branch" not in t.read().columns
    # data row survives, only the column is gone
    assert t.read().first()["lang"] == "python"

    # re-add the same name: fresh field id, old value does NOT come back
    assert t.add_column("branch", "string")
    new_id = [col for col in t.current_schema()
              if col["name"] == "branch"][0]["id"]
    assert new_id != old_id
    assert t.read().first()["branch"] is None

    # a write after the re-add binds to the new id
    acts2 = spark.createDataFrame(
        [("r2", "b.py", c(2), 0, "upsert", "go", "v2", "s2", "dev")],
        "repo string, path string, commit string, event_seq bigint, "
        "op string, lang string, content string, content_sha string, "
        "branch string")
    t.merge_batch(acts2, epoch=1)
    got = {r["repo"]: r for r in t.read().collect()}
    assert got["r1"]["branch"] is None and got["r2"]["branch"] == "dev"

    # engine columns are protected
    with pytest.raises(ValueError):
        t.drop_column("repo")


def test_atomic_version_pointer_and_time_travel(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=2)
    t.merge_batch(
        _mk_actions(spark, [("r", "p", c(1), 0, "upsert", "go", "v1", "s")]), epoch=0
    )
    v1 = t.manifest()["version"]
    t.merge_batch(
        _mk_actions(spark, [("r", "p", c(2), 0, "upsert", "go", "v2", "s")]), epoch=1
    )
    assert t.read(version=v1).first()["content"] == "v1"
    assert t.read().first()["content"] == "v2"
    with open(os.path.join(t.path, "_VERSION")) as f:
        cur = int(f.read())
    assert json.load(open(os.path.join(t.path, "manifests", f"v{cur}.json")))[
        "properties"
    ]["hwm_epoch"] == 1


def test_ledger_lineage(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=4)
    t.merge_batch(
        _mk_actions(
            spark,
            [(f"r{i}", "p.py", c(i + 1), 0, "upsert", "go", "v", "s") for i in range(8)],
        ),
        epoch=0,
    )
    led = t.read_ledger().toPandas()
    assert set(led.columns) == {"epoch", "bucket", "rows", "version"}
    assert led["rows"].sum() == 8


def test_compact(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=2)
    rows = [(f"r{i}", f"p{i}.py", c(i + 1), 0, "upsert", "go", "v", "s")
            for i in range(30)]
    t.merge_batch(_mk_actions(spark, rows), epoch=0, files_per_bucket=3)
    n_files_before = len(t.file_entries())
    before = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    res = t.compact(target_files_per_bucket=1)
    assert res["compacted_buckets"] >= 1
    after = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert before == after
    assert len(t.file_entries()) <= n_files_before


def test_lookup_bucket_pruned(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=8)
    rows = [(f"r{i}", "p.py", c(i + 1), 0, "upsert", "go", f"v{i}", "s")
            for i in range(20)]
    t.merge_batch(_mk_actions(spark, rows), epoch=0)
    keys = spark.createDataFrame([("r3", "p.py"), ("zz", "nope")],
                                 "repo string, path string")
    got = t.lookup(keys).collect()
    assert len(got) == 1 and got[0]["content"] == "v3"


def test_schema_evolution_widen_column(spark, warehouse):
    """Lossless type promotion (Iceberg rules): metadata-only, old narrow
    files cast up at read via the id-bound rebind, time travel keeps the
    old type, narrowing/cross-kind promotions rejected."""
    import pytest
    from pyspark.sql import types as T

    for mode in ("mor", "cow"):
        t = LakeTable.create(spark, os.path.join(warehouse, mode),
                             num_buckets=4, merge_mode=mode)
        assert t.add_column("stars", "int")
        acts = spark.createDataFrame(
            [("r1", "a.py", c(1), 0, "upsert", "go", "v1", "s1", 7)],
            "repo string, path string, commit string, event_seq bigint, "
            "op string, lang string, content string, content_sha string, "
            "stars int",
        )
        t.merge_batch(acts, epoch=0)
        v_narrow = t.manifest()["version"]

        assert t.widen_column("stars", "bigint")
        assert not t.widen_column("stars", "bigint")  # idempotent
        # old narrow file reads as the widened type, value intact
        df = t.read()
        assert isinstance(df.schema["stars"].dataType, T.LongType)
        assert df.first()["stars"] == 7
        # time travel: the pre-widening snapshot keeps the narrow type
        old = t.read(version=v_narrow)
        assert isinstance(old.schema["stars"].dataType, T.IntegerType)

        # post-widening write with a value outside int range; a batch
        # still carrying the narrow int type is cast up on write
        acts2 = spark.createDataFrame(
            [("r2", "b.py", c(2), 0, "upsert", "go", "v2", "s2",
              2**40), ("r1", "a.py", c(2), 1, "upsert", "go", "v1b",
                       "s1b", 9)],
            "repo string, path string, commit string, event_seq bigint, "
            "op string, lang string, content string, content_sha string, "
            "stars bigint",
        )
        t.merge_batch(acts2, epoch=1)
        got = {r["repo"]: r["stars"] for r in t.read().collect()}
        assert got == {"r1": 9, "r2": 2**40}, mode

        # rejected promotions
        with pytest.raises(ValueError):
            t.widen_column("stars", "int")          # narrowing
        with pytest.raises(ValueError):
            t.widen_column("lang", "bigint")        # cross-kind
        with pytest.raises(ValueError):
            t.widen_column("event_seq", "bigint")   # engine column
        with pytest.raises(KeyError):
            t.widen_column("nope", "bigint")
