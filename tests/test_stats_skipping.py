"""File-level ord stats + manifest data skipping (read_since).

Stats come from parquet footers at commit time (zero extra I/O); pruning
is sound-by-construction (stat-less files are never skipped). Equality is
checked against the brute-force definition computed from a full read.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from skipmap_processor_spark.lake import LakeTable


def _mk_actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, "
        "op string, lang string, content string, content_sha string",
    )


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 24


def _build(spark, path, mode="mor"):
    t = LakeTable.create(spark, path, num_buckets=4, merge_mode=mode)
    keys = [("r%d" % (i % 2), "f%02d.py" % i) for i in range(12)]
    for e in range(5):
        rows = [(r, p, c(e + 1), i, "upsert", "go", f"v{e + 1}", "s")
                for i, (r, p) in enumerate(keys) if i % (e + 1) == 0]
        if e == 3:
            # key 7 is untouched by later epochs (7 % 5 != 0), so the
            # tombstone stays the winner
            rows += [(keys[7][0], keys[7][1], c(e + 1), 99, "delete",
                      None, None, None)]
        t.merge_batch(_mk_actions(spark, rows), epoch=e)
    return t


def _expected_since(t, floor):
    full = t.read(include_deleted=True, with_engine_cols=True)
    return sorted(tuple(r) for r in full.filter(F.col("commit") > floor).collect())


def test_stats_recorded_on_new_files(spark, warehouse):
    t = _build(spark, os.path.join(warehouse, "t"))
    fes = t.file_entries()
    assert fes and all("stats" in fe for fe in fes)
    for fe in fes:
        lo, hi = fe["stats"]["commit"]
        assert isinstance(lo, str) and lo <= hi
        elo, ehi = fe["stats"]["_epoch"]
        assert isinstance(elo, int) and elo <= ehi


def test_read_since_prunes_and_matches_bruteforce_mor(spark, warehouse):
    t = _build(spark, os.path.join(warehouse, "t"))
    for e in range(5):
        floor = c(e + 1)
        keep, skipped = t.files_since(floor)
        got = sorted(tuple(r) for r in t.read_since(floor).collect())
        assert got == _expected_since(t, floor), f"floor {e + 1}"
        # epochs <= floor wrote delta files whose max commit <= floor
        assert skipped >= e * 1, f"no skipping at floor {e + 1}"
    # floor above everything: all files skipped, empty result
    keep, skipped = t.files_since(c(99))
    assert not keep and skipped == len(t.file_entries())
    assert t.read_since(c(99)).count() == 0


def test_read_since_cow_and_flags(spark, warehouse):
    t = _build(spark, os.path.join(warehouse, "t"), mode="cow")
    floor = c(3)
    got = sorted(tuple(r) for r in t.read_since(floor).collect())
    assert got == _expected_since(t, floor)
    # tombstone (deleted in epoch 3 -> commit c(4) > c(3)) visible, then not
    dels = t.read_since(floor).filter("is_deleted").count()
    assert dels == 1
    assert t.read_since(floor, include_deleted=False).filter(
        "is_deleted").count() == 0


def test_read_since_after_compact_still_exact(spark, warehouse):
    t = _build(spark, os.path.join(warehouse, "t"))
    want = _expected_since(t, c(2))
    t.compact()
    got = sorted(tuple(r) for r in t.read_since(c(2)).collect())
    assert got == want
    # compacted files span all ords: stats exist, nothing skippable at low
    # floors, everything skippable above the max
    _, skipped = t.files_since(c(0))
    assert skipped == 0
    keep, _ = t.files_since(c(99))
    assert not keep
