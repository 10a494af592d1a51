"""Row-level DELETE ... WHERE / UPDATE ... SET (Python + SQL surfaces).

Oracle: DML over the live table equals the set-algebra result (filtered /
rewritten rows), the self-generated events respect the ord gate — a later
feed commit out-orders a surface delete, a stale feed commit does not
resurrect — and the content-sha invariant survives updates.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from skipmap_processor_spark.lake import LakeTable
from skipmap_processor_spark.sql_merge import (
    execute_delete_from,
    execute_update,
)


def _mk_actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, op string, "
        "lang string, content string, content_sha string",
    )


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 24


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _rows(n):
    return [("r%d" % (i % 3), f"f{i}.py", c(10 + i), 0, "upsert",
             "go" if i % 2 else "py", f"body{i}", _sha(f"body{i}"))
            for i in range(n)]


def _state(t, cols=("repo", "path", "content", "lang"), **kw):
    return sorted(map(tuple, t.read(**kw).select(*cols).collect()))


@pytest.fixture(params=["mor", "cow"])
def lake(request, spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, f"t_{request.param}"),
                         num_buckets=4, merge_mode=request.param)
    t.merge_batch(_mk_actions(spark, _rows(30)), epoch=0)
    return t


def test_delete_where_equals_filtered_state(lake, spark):
    before = _state(lake)
    stats = lake.delete_where("lang = 'py'")
    assert not stats.get("skipped")
    want = [r for r in before if r[3] != "py"]
    assert _state(lake) == want
    # idempotent under the ord gate: re-running matches nothing (the rows
    # are gone from the live view) and deletes nothing more
    lake.delete_where("lang = 'py'")
    assert _state(lake) == want


def test_delete_then_feed_interplay(lake, spark):
    lake.delete_where("repo = 'r1'")
    assert all(r[0] != "r1" for r in _state(lake))

    # a LATER feed commit (higher binlog id) out-orders the surface delete
    lake.merge_batch(_mk_actions(
        spark, [("r1", "f1.py", c(999), 0, "upsert", "go", "new", _sha("new"))]),
        epoch=1)
    assert ("r1", "f1.py", "new", "go") in _state(lake)

    # a STALE feed commit (lower than the deleted winner's ord) must NOT
    # resurrect the key: the delete's (commit, event_seq+1) still wins
    lake.merge_batch(_mk_actions(
        spark, [("r1", "f4.py", c(1), 0, "upsert", "go", "old", _sha("old"))]),
        epoch=2)
    assert all(not (r[0] == "r1" and r[1] == "f4.py") for r in _state(lake))


def test_update_where_rewrites_and_rehashes(lake, spark):
    before = dict(((r[0], r[1]), r) for r in _state(lake))
    lake.update_where("lang = 'go'", {"content": "concat(content, '!')"})
    got = lake.read().select(
        "repo", "path", "content", "content_sha", "lang").collect()
    for r in got:
        old = before[(r.repo, r.path)]
        if r.lang == "go":
            assert r.content == old[2] + "!", "SET reads the ORIGINAL row"
            assert r.content_sha == _sha(r.content), "sha invariant"
        else:
            assert r.content == old[2]


def test_update_where_rejects_key_and_unknown_columns(lake):
    with pytest.raises(ValueError, match="cannot assign"):
        lake.update_where("true", {"repo": "'x'"})
    with pytest.raises(ValueError, match="cannot assign"):
        lake.update_where("true", {"commit": "'x'"})
    with pytest.raises(ValueError, match="cannot assign"):
        lake.update_where("true", {"nope": "'x'"})


def test_sql_delete_and_update_surface(lake, spark):
    twin_state = [r for r in _state(lake) if not (r[3] == "py")]
    execute_delete_from(spark, "DELETE FROM code WHERE lang = 'py'",
                        tables={"code": lake})
    assert _state(lake) == twin_state

    execute_update(
        spark,
        "UPDATE code SET content = concat('X', content), lang = 'rs' "
        "WHERE repo = 'r0'",
        tables={"code": lake})
    for r in lake.read().select("repo", "content", "lang").collect():
        if r.repo == "r0":
            assert r.lang == "rs" and r.content.startswith("X")
        else:
            assert r.lang != "rs"

    with pytest.raises(ValueError, match="unsupported DELETE"):
        execute_delete_from(spark, "DELETE FROM code", tables={"code": lake})
    with pytest.raises(ValueError, match="unsupported UPDATE"):
        execute_update(spark, "UPDATE code SET x = 1", tables={"code": lake})
    with pytest.raises(ValueError, match="unknown target"):
        execute_delete_from(spark, "DELETE FROM other WHERE true", tables={})


def test_delete_where_epoch_gate_exactly_once(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "gated"),
                         num_buckets=2, merge_mode="mor")
    t.merge_batch(_mk_actions(spark, _rows(10)), epoch=0)
    s1 = t.delete_where("lang = 'py'", epoch=1)
    assert not s1.get("skipped")
    v_after = t.manifest()["version"]
    s2 = t.delete_where("lang = 'py'", epoch=1)  # redelivery
    assert s2.get("skipped")
    assert t.manifest()["version"] == v_after
