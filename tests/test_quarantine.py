"""Dead-letter quarantine: malformed events divert to _quarantine/ (or fail
loudly), clean rows still apply and match the oracle, replays stay
idempotent, and junk rows can neither promote schema nor abort the epoch
via a garbage commit id."""

from __future__ import annotations

import os
from datetime import datetime

import pandas as pd
import pytest

from skipmap_processor_spark.lake import LakeTable
from skipmap_processor_spark.oracle import replay
from skipmap_processor_spark.sources.events import (
    base_spark_schema,
    commit_str,
    event_spark_schema,
    generate_full,
)
from skipmap_processor_spark.streaming.pipeline import (
    apply_epoch,
    bootstrap_base,
    replay_log,
)
from skipmap_processor_spark.streaming.quarantine import read_quarantine

_TS = datetime(2026, 3, 1)


def _row(epoch, op, repo, path, *, new_path=None, commit=None, seq=0,
         lang="py", content=None, extra=None):
    return {
        "epoch": int(epoch), "event_seq": seq, "commit": commit,
        "ts": _TS, "op": op, "repo": repo, "path": path,
        "new_path": new_path, "lang": lang, "content": content,
        "schema_ver": 1, "extra_cols": extra,
    }


def _clean_epoch3(oracle_live: pd.DataFrame) -> list[dict]:
    """Two upserts + one rename of a key live after the fixture epochs."""
    src = oracle_live.sort_values(["repo", "path"]).iloc[0]
    return [
        _row(3, "update", "org0/repo0", "src/q_new.py",
             commit=commit_str(5_000_000), content="print('q0')"),
        _row(3, "update", "org1/repo1", "src/q_new2.py",
             commit=commit_str(5_000_001), content="print('q1')"),
        _row(3, "rename", src["repo"], src["path"],
             new_path=src["path"] + ".renamed",
             commit=commit_str(5_000_002), lang=None),
    ]


def _malformed_epoch3() -> list[dict]:
    return [
        # null repo AND a 2-char commit: must quarantine, and must NOT trip
        # the fixed-width ord probe for the epoch's clean rows
        _row(3, "update", None, "ghost.py", commit="zz", content="x"),
        # unknown op
        _row(3, "truncate", "org0/repo0", "victim.py",
             commit=commit_str(5_100_000)),
        # rename without a target
        _row(3, "rename", "org0/repo0", "src/q_new.py", new_path=None,
             commit=commit_str(5_100_001), lang=None),
        # null path + null commit/seq, carrying a junk extra column that
        # must not auto-promote into the table schema
        {"epoch": 3, "event_seq": None, "commit": None, "ts": _TS,
         "op": "update", "repo": "org2/repo2", "path": None,
         "new_path": None, "lang": "py", "content": "x", "schema_ver": 1,
         "extra_cols": {"junk_col": "boom"}},
    ]


def _to_spark(spark, ev: pd.DataFrame):
    rows = ev.to_dict("records")
    for r in rows:
        for k, v in list(r.items()):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                r[k] = None
        if isinstance(r.get("ts"), pd.Timestamp):
            r["ts"] = r["ts"].to_pydatetime()
        for k in ("epoch", "event_seq", "schema_ver"):
            if r.get(k) is not None:
                r[k] = int(r[k])
    return spark.createDataFrame(rows, schema=event_spark_schema())


@pytest.fixture(scope="module")
def fixtures():
    base, ev, ddl = generate_full(
        n_repos=8, n_base_paths=60, n_events=240, n_epochs=3)
    clean3 = _clean_epoch3(replay(base, ev, ddl))
    ev_clean = pd.concat(
        [ev, pd.DataFrame(clean3)], ignore_index=True)
    ev_dirty = pd.concat(
        [ev, pd.DataFrame(clean3 + _malformed_epoch3())], ignore_index=True)
    oracle = replay(base, ev_clean, ddl)
    return base, ddl, ev_clean, ev_dirty, oracle


def _mk_lake(spark, warehouse, name, merge_mode, base):
    lake = LakeTable.create(spark, os.path.join(warehouse, name),
                            num_buckets=8, merge_mode=merge_mode)
    bootstrap_base(lake, spark.createDataFrame(
        base, schema=base_spark_schema()))
    return lake


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_quarantine_applies_clean_rows_and_matches_oracle(
        spark, warehouse, fixtures, merge_mode):
    base, ddl, _, ev_dirty, oracle = fixtures
    lake = _mk_lake(spark, warehouse, f"q_{merge_mode}", merge_mode, base)
    stats = replay_log(spark, lake, _to_spark(spark, ev_dirty), ddl,
                       on_malformed="quarantine")
    assert stats[-1].get("quarantined") == 4
    assert sum(s.get("quarantined", 0) for s in stats) == 4

    engine = (lake.read().toPandas()
              .sort_values(["repo", "path"]).reset_index(drop=True))
    o = oracle.sort_values(["repo", "path"]).reset_index(drop=True)
    cols = sorted(o.columns)
    assert sorted(engine.columns) == cols
    pd.testing.assert_frame_equal(
        engine[cols], o[cols], check_dtype=False)

    q = read_quarantine(lake).toPandas()
    assert len(q) == 4
    assert sorted(q["_reason"]) == [
        "null_key", "null_key", "rename_null_target", "unknown_op"]
    assert set(q["epoch"]) == {3}
    # the junk extra column never reached the schema
    assert "junk_col" not in lake.current_columns()
    # the clean rename in the same epoch still applied
    assert engine["path"].str.endswith(".renamed").any()


def test_error_mode_fails_loudly_before_any_commit(spark, warehouse,
                                                   fixtures):
    base, ddl, _, ev_dirty, _ = fixtures
    lake = _mk_lake(spark, warehouse, "q_err", "mor", base)
    ev = _to_spark(spark, ev_dirty)
    for ep in (0, 1, 2):
        from pyspark.sql import functions as F

        apply_epoch(lake, ev.filter(F.col("epoch") == ep).drop("epoch"),
                    ep, ddl)
    v_before = lake.manifest()["version"]
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="4 malformed.*null_key=2"):
        apply_epoch(lake, ev.filter(F.col("epoch") == 3).drop("epoch"), 3,
                    ddl)
    assert lake.manifest()["version"] == v_before
    assert not lake.epoch_applied(3)
    assert read_quarantine(lake).count() == 0


def test_quarantine_replay_is_idempotent(spark, warehouse, fixtures):
    base, ddl, _, ev_dirty, _ = fixtures
    lake = _mk_lake(spark, warehouse, "q_replay", "mor", base)
    ev = _to_spark(spark, ev_dirty)
    replay_log(spark, lake, ev, ddl, on_malformed="quarantine")
    v = lake.manifest()["version"]

    from pyspark.sql import functions as F

    again = apply_epoch(lake, ev.filter(F.col("epoch") == 3).drop("epoch"),
                        3, ddl, on_malformed="quarantine")
    assert again["skipped"]
    assert lake.manifest()["version"] == v
    assert read_quarantine(lake, epoch=3).count() == 4
