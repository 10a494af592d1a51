"""Round-2 lake guarantees: optimistic multi-writer commits, tombstone/ledger
retention GC, and gap-safe epoch tracking (late-landing epochs are applied,
not silently dropped).

Reference precedents: concurrent-write deadlock retry with backoff
(/root/reference/src/clustering/database/PostgreSQLClusteringDatabase.ts:136-172)
and TTL expiry (/root/reference/src/utils/PostgresCache.ts:227-232,380-398).
"""

from __future__ import annotations

import os
import threading

import pytest

from pyspark.sql import functions as F

from skipmap_processor_spark.lake import LakeTable

ACTION_DDL = (
    "repo string, path string, commit string, event_seq bigint, op string, "
    "lang string, content string, content_sha string"
)


def _mk_actions(spark, rows):
    return spark.createDataFrame(rows, ACTION_DDL)


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 24


def _rows_for_epoch(ep: int):
    """Deterministic per-epoch batch: 20 keys, each epoch upserts newer ords."""
    return [
        ("r1", f"f{k}.py", c(ep * 100 + k), 0, "upsert", "py",
         f"v{ep}-{k}", f"s{ep}-{k}")
        for k in range(20)
    ]


def test_concurrent_writers_interleaved_epochs(spark, warehouse):
    """Two threads racing interleaved epochs into one MOR table must commit
    every epoch exactly once and converge to the sequential-replay state
    (optimistic CAS + rebase, VERDICT r1 item 6)."""
    path = os.path.join(warehouse, "concurrent")
    lake = LakeTable.create(spark, path, num_buckets=4, merge_mode="mor")
    epochs = list(range(8))
    stats: dict[int, dict] = {}
    errors: list[Exception] = []

    def writer(eps):
        try:
            w = LakeTable.load(spark, path)
            for ep in eps:
                stats[ep] = w.merge_batch(
                    _mk_actions(spark, _rows_for_epoch(ep)), epoch=ep)
        except Exception as e:  # pragma: no cover - surfaced by assert below
            errors.append(e)

    t1 = threading.Thread(target=writer, args=(epochs[0::2],))
    t2 = threading.Thread(target=writer, args=(epochs[1::2],))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors, errors
    applied = [ep for ep, s in stats.items() if not s.get("skipped")]
    assert sorted(applied) == epochs, "every epoch committed exactly once"
    assert lake.hwm_epoch == 7
    assert lake.missing_epochs == []

    # final state == sequential oracle (same batches applied in order)
    seq = LakeTable.create(spark, os.path.join(warehouse, "sequential"),
                           num_buckets=4, merge_mode="mor")
    for ep in epochs:
        seq.merge_batch(_mk_actions(spark, _rows_for_epoch(ep)), epoch=ep)
    got = lake.read().orderBy("repo", "path").toPandas()
    want = seq.read().orderBy("repo", "path").toPandas()
    assert got.equals(want)

    # redelivery of any epoch after the race is still a no-op
    r = lake.merge_batch(_mk_actions(spark, _rows_for_epoch(3)), epoch=3)
    assert r["skipped"]


def test_late_epoch_is_applied_not_dropped(spark, warehouse):
    """A never-applied epoch landing below the HWM (out-of-mtime-order binlog
    file) is applied — the old gate conflated it with 'already applied' and
    lost its events permanently (ADVICE r1)."""
    lake = LakeTable.create(spark, os.path.join(warehouse, "late"),
                            num_buckets=4, merge_mode="mor")
    lake.merge_batch(_mk_actions(spark, _rows_for_epoch(0)), epoch=0)
    lake.merge_batch(_mk_actions(spark, _rows_for_epoch(2)), epoch=2)
    assert lake.missing_epochs == [1]

    # epoch 1 carries a key nobody else writes — if the gate dropped it the
    # key would never exist
    late = [("r1", "only-in-1.py", c(150), 0, "upsert", "py", "late", "sl")]
    r = lake.merge_batch(_mk_actions(spark, late), epoch=1)
    assert not r["skipped"], "late epoch must be applied"
    assert lake.missing_epochs == []
    assert lake.hwm_epoch == 2
    assert lake.read().filter(F.col("path") == "only-in-1.py").count() == 1

    # replaying it NOW is a no-op
    assert lake.merge_batch(_mk_actions(spark, late), epoch=1)["skipped"]


def test_retention_compaction_drops_old_tombstones(spark, warehouse):
    """compact(retention_epochs=K) drops tombstones older than hwm-K, shrinks
    the table, folds the ledger, and leaves the visible state unchanged
    (VERDICT r1 item 5)."""
    lake = LakeTable.create(spark, os.path.join(warehouse, "ret"),
                            num_buckets=4, merge_mode="mor")
    lake.merge_batch(_mk_actions(spark, _rows_for_epoch(0)), epoch=0)
    # epoch 1: delete half the keys
    dels = [("r1", f"f{k}.py", c(100 + k), 0, "delete", None, None, None)
            for k in range(10)]
    lake.merge_batch(_mk_actions(spark, dels), epoch=1)
    for ep in (2, 3, 4, 5):
        # later epochs touch only the surviving keys — the 10 tombstones
        # must stay the latest version of their keys
        rows = [r for r in _rows_for_epoch(ep) if int(r[1][1:-3]) >= 10]
        lake.merge_batch(_mk_actions(spark, rows), epoch=ep)

    visible_before = lake.read().orderBy("repo", "path").toPandas()
    with_dead = lake.read(include_deleted=True).count()
    assert with_dead == visible_before.shape[0] + 10  # 10 tombstones live

    ledger_dir = os.path.join(lake.path, "_ledger")
    assert len(os.listdir(ledger_dir)) > 1
    res = lake.compact(retention_epochs=2)  # horizon = 5 - 2 = 3 >= 1
    assert res["retention_horizon"] == 3
    assert res["ledger_files_folded"] > 1
    assert len([f for f in os.listdir(ledger_dir) if f.endswith(".parquet")]) == 1

    # tombstones from epoch 1 are gone; visible state unchanged
    assert lake.read(include_deleted=True).count() == visible_before.shape[0]
    assert lake.read().orderBy("repo", "path").toPandas().equals(visible_before)

    # ledger content survives the fold (lineage for all 6 epochs)
    eps = {r["epoch"] for r in lake.read_ledger().select("epoch").distinct().collect()}
    assert eps == {0, 1, 2, 3, 4, 5}

    # the epoch gate (not the tombstone) is what blocks replay of the
    # deleting epoch after GC — exactly-once survives retention
    assert lake.merge_batch(_mk_actions(spark, dels), epoch=1)["skipped"]


def test_retention_capped_by_outstanding_missing_epoch(spark, warehouse):
    """Retention GC must not drop a tombstone that could still gate an
    outstanding (never-applied, below-HWM) epoch: the late epoch's stale
    upsert would resurrect the deleted row (ADVICE r2). The horizon is
    capped below min(missing) until the gap closes."""
    lake = LakeTable.create(spark, os.path.join(warehouse, "retgap"),
                            num_buckets=4, merge_mode="mor")
    lake.merge_batch(
        _mk_actions(spark, [("r1", "x.py", c(10), 0, "upsert", "go", "v", "s")]),
        epoch=0)
    # epoch 1 never arrives yet; epoch 2 deletes the key
    lake.merge_batch(
        _mk_actions(spark, [("r1", "x.py", c(20), 0, "delete", None, None,
                             None)]), epoch=2)
    for ep in range(3, 9):
        lake.merge_batch(
            _mk_actions(spark, [("r9", "y.py", c(ep * 10), 0, "upsert", "go",
                                 f"v{ep}", "s")]), epoch=ep)
    assert lake.missing_epochs == [1]

    # horizon would be 8-2=6 (tombstone epoch 2 <= 6 -> dropped), but the
    # outstanding epoch 1 caps it at 0 -> tombstone kept
    res = lake.compact(retention_epochs=2)
    assert res["retention_horizon"] == 0
    assert lake.read(include_deleted=True).filter(
        F.col("is_deleted")).count() == 1

    # the late epoch finally lands with a STALE upsert for the deleted key:
    # the surviving tombstone (newer ord) must win - no resurrection
    lake.merge_batch(
        _mk_actions(spark, [("r1", "x.py", c(15), 0, "upsert", "go", "zombie",
                             "s")]), epoch=1)
    assert lake.read().filter(F.col("path") == "x.py").count() == 0

    # gap closed -> the next retention pass may really drop the tombstone
    res2 = lake.compact(retention_epochs=2)
    assert res2["retention_horizon"] == 6
    assert lake.read(include_deleted=True).filter(
        F.col("is_deleted")).count() == 0


def test_nonzero_epoch_base_opens_no_gap(spark, warehouse):
    """A feed whose epoch numbering starts above 0 (timestamp/offset epoch
    spaces) must NOT record [0, first-1] as missing: that phantom gap never
    closes, permanently pins the retention horizon at -1 (silently disabling
    tombstone GC), and raises a false out-of-order alert (ADVICE r3). The
    table's configured epoch_base bounds gap tracking from below."""
    base = 1_700_000_000  # timestamp-shaped epoch
    lake = LakeTable.create(spark, os.path.join(warehouse, "epochbase"),
                            num_buckets=4, merge_mode="mor", epoch_base=base)
    lake.merge_batch(_mk_actions(spark, _rows_for_epoch(0)), epoch=base)
    assert lake.missing_intervals() == []
    assert lake.hwm_epoch == base

    # delete a key at base+1, advance to base+5: retention GC must actually
    # run (horizon not pinned at -1 by a phantom [0, base-1] gap)
    dels = [("r1", "f0.py", c(999), 0, "delete", None, None, None)]
    lake.merge_batch(_mk_actions(spark, dels), epoch=base + 1)
    for ep in range(base + 2, base + 6):
        rows = [r for r in _rows_for_epoch(ep - base) if r[1] != "f0.py"]
        lake.merge_batch(_mk_actions(spark, rows), epoch=ep)
    assert lake.missing_intervals() == []
    res = lake.compact(retention_epochs=2)
    assert res["retention_horizon"] == base + 3
    assert lake.read(include_deleted=True).filter(
        F.col("is_deleted")).count() == 0  # tombstone GC'd, not disabled
    # a genuine gap above the base still tracks
    lake.merge_batch(
        _mk_actions(spark, [("r2", "q.py", c(7), 0, "upsert", "go", "v",
                             "s")]), epoch=base + 8)
    assert lake.missing_intervals() == [[base + 6, base + 7]]


def test_missing_epochs_stored_as_intervals(spark, warehouse):
    """A wide epoch gap costs ONE [start, end] pair in the manifest, not a
    materialized list (sparse epoch spaces, ADVICE r2)."""
    import json as _json

    lake = LakeTable.create(spark, os.path.join(warehouse, "gaps"),
                            num_buckets=4, merge_mode="mor")
    lake.merge_batch(_mk_actions(spark, _rows_for_epoch(0)), epoch=0)
    lake.merge_batch(
        _mk_actions(spark, [("r1", "z.py", c(5), 0, "upsert", "go", "v", "s")]),
        epoch=500_000)
    mani_path = os.path.join(lake.path, "manifests",
                             f"v{lake.manifest()['version']}.json")
    assert os.path.getsize(mani_path) < 4096  # gap = one pair, not 500k ints
    assert lake.missing_intervals() == [[1, 499_999]]
    with pytest.raises(ValueError):
        lake.missing_epochs  # too wide to expand - refuses, not OOMs
    # epochs inside the gap still apply (late), outside are blocked
    assert not lake.epoch_applied(123_456)
    r = lake.merge_batch(
        _mk_actions(spark, [("r2", "w.py", c(6), 0, "upsert", "go", "v", "s")]),
        epoch=123_456)
    assert not r["skipped"]
    assert lake.missing_intervals() == [[1, 123_455], [123_457, 499_999]]
    assert lake.epoch_applied(123_456)
    # legacy flat-int manifests are read back as intervals
    mani = lake.manifest()
    legacy = _json.loads(_json.dumps(mani))
    legacy["properties"]["missing_below"] = [3, 4, 5, 9]
    legacy["version"] = mani["version"] + 1
    lake._commit_manifest(legacy)
    assert lake.missing_intervals() == [[3, 5], [9, 9]]


def test_concurrent_schema_and_data_commits(spark, warehouse):
    """Metadata commits (add_column) racing MOR data commits rebase cleanly."""
    path = os.path.join(warehouse, "meta_race")
    lake = LakeTable.create(spark, path, num_buckets=4, merge_mode="mor")
    errors: list[Exception] = []

    def data_writer():
        try:
            w = LakeTable.load(spark, path)
            for ep in range(6):
                w.merge_batch(_mk_actions(spark, _rows_for_epoch(ep)), epoch=ep)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def ddl_writer():
        try:
            w = LakeTable.load(spark, path)
            for i in range(5):
                w.add_column(f"extra_{i}", "string")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    t1 = threading.Thread(target=data_writer)
    t2 = threading.Thread(target=ddl_writer)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors, errors
    assert lake.hwm_epoch == 5
    cols = set(lake.current_columns())
    assert {f"extra_{i}" for i in range(5)} <= cols
    assert lake.read().count() == 20  # 20 keys, all epochs upsert same keys
