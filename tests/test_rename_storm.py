"""Rename-storm epochs and the driver boundary (guide §5): an in-order
epoch's renames are resolution-final by a row-independent predicate, so
NONE of them may cross to the driver — proven by monkeypatching the only
collect site to raise. Out-of-order epochs still collect (their renames
must be parked into the manifest)."""
from __future__ import annotations

import pandas as pd
import pytest

import skipmap_processor_spark.streaming.pipeline as pipeline
from skipmap_processor_spark.lake import LakeTable
from skipmap_processor_spark.oracle import replay
from skipmap_processor_spark.sources.events import (base_spark_schema,
                                                    commit_str,
                                                    event_spark_schema)
from skipmap_processor_spark.streaming.pipeline import (apply_epoch,
                                                        bootstrap_base)


@pytest.fixture(scope="module")
def spark():
    from skipmap_processor_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4,
                  driver_memory="4g", app_name="test-rename-storm")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _apply(spark, lake, ev: pd.DataFrame, epoch: int) -> dict:
    part = ev[ev["epoch"] == epoch].drop(columns=["epoch"])
    records = part.to_dict("records")
    for r in records:
        r["ts"] = r["ts"].to_pydatetime()
    sub_schema = event_spark_schema()
    sub_schema = type(sub_schema)(
        [f for f in sub_schema.fields if f.name != "epoch"])
    batch = spark.createDataFrame(records, schema=sub_schema)
    return apply_epoch(lake, batch, epoch)


def _storm(n_chains: int, chain_len: int) -> pd.DataFrame:
    """Epoch 0 (the first promised epoch — in-order by construction):
    every chain c renames c_0 -> c_1 -> ... -> c_len, plus a
    final update of the chain head — a mass `git mv` epoch."""
    rows = []
    seq = 0
    for c in range(n_chains):
        for i in range(chain_len):
            rows.append({"epoch": 0, "op": "rename",
                         "path": f"d{c}/f{i}.py",
                         "new_path": f"d{c}/f{i + 1}.py"})
        rows.append({"epoch": 0, "op": "update",
                     "path": f"d{c}/f{chain_len}.py", "content": "moved"})
        seq += 1
    out = []
    for i, r in enumerate(rows):
        out.append({
            "epoch": r["epoch"], "event_seq": 0,
            "commit": commit_str(i + 1),
            "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=i),
            "op": r["op"], "repo": "org/r", "path": r["path"],
            "new_path": r.get("new_path"), "lang": "py",
            "content": r.get("content"), "schema_ver": 1,
            "extra_cols": None,
        })
    return pd.DataFrame(out)


def _base_rows(n_chains: int) -> list[tuple]:
    return [("org/r", f"d{c}/f0.py", commit_str(0), "py", "v0")
            for c in range(n_chains)]


def test_inorder_rename_storm_never_reaches_the_driver(
        spark, tmp_path, monkeypatch):
    """300 chains x 10 renames (3000 rename events) in ONE in-order
    epoch: the collect site is patched to raise, nothing is parked, and
    the final table equals the sequential oracle. The predicate is
    row-independent, so this holds at any storm size — 100k renames cost
    the driver exactly what 3k do: nothing."""
    n_chains, chain_len = 300, 10
    ev = _storm(n_chains, chain_len)
    lake = LakeTable.create(spark, str(tmp_path / "lake"), num_buckets=8,
                            merge_mode="mor")
    bootstrap_base(lake, spark.createDataFrame(
        _base_rows(n_chains), schema=base_spark_schema()))

    def _boom(events):
        raise AssertionError(
            "in-order rename storm materialized on the driver")

    monkeypatch.setattr(pipeline, "_collect_renames", _boom)
    _apply(spark, lake, ev, 0)
    assert lake.parked_renames() == []

    base_pdf = pd.DataFrame(
        _base_rows(n_chains),
        columns=["repo", "path", "commit", "lang", "content"])
    oracle = replay(base_pdf, ev)
    engine = (lake.read().toPandas()
              .sort_values(["repo", "path"]).reset_index(drop=True))
    cols = sorted(oracle.columns)
    pd.testing.assert_frame_equal(
        engine[cols].astype({"event_seq": "int64"}),
        oracle[cols].astype({"event_seq": "int64"}),
        check_dtype=False,
    )
    assert len(engine) == n_chains
    assert set(engine["path"]) == {f"d{c}/f{chain_len}.py"
                                   for c in range(n_chains)}


def test_out_of_order_rename_still_parks_via_collect(
        spark, tmp_path, monkeypatch):
    """An epoch applying ABOVE an open gap must still collect and park
    its renames — the branch guard must not starve the parked path."""
    ev = pd.DataFrame([{
        "epoch": 2, "event_seq": 0, "commit": commit_str(1),
        "ts": pd.Timestamp("2026-01-01"), "op": "rename", "repo": "org/r",
        "path": "a.py", "new_path": "b.py", "lang": "py", "content": None,
        "schema_ver": 1, "extra_cols": None,
    }])
    lake = LakeTable.create(spark, str(tmp_path / "lake"), num_buckets=4,
                            merge_mode="mor")
    bootstrap_base(lake, spark.createDataFrame(
        [("org/r", "a.py", commit_str(0), "py", "v0")],
        schema=base_spark_schema()))

    calls = {"n": 0}
    real = pipeline._collect_renames

    def counting(events):
        calls["n"] += 1
        return real(events)

    monkeypatch.setattr(pipeline, "_collect_renames", counting)
    _apply(spark, lake, ev, 2)  # epoch 1 missing -> gap below
    assert calls["n"] == 1
    assert [(p["path"], p["new_path"], p["epoch"])
            for p in lake.parked_renames()] == [("a.py", "b.py", 2)]
