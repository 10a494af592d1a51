"""Timestamp time travel (TIMESTAMP AS OF), per-file row caps, and fsck.

Oracles: as-of-timestamp reads equal the version snapshot that was current
at that instant; a row-capped table reads identically to its uncapped twin
while never writing a file above the cap; fsck is green on a healthy table
and names each injected fault (missing file, truncation, descriptor drift,
row-count drift, dangling ref) exactly.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from skipmap_processor_spark.lake import LakeTable


def _mk_actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, op string, "
        "lang string, content string, content_sha string",
    )


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 24


def _state(t, **kw):
    return sorted(map(tuple, t.read(**kw).select(
        "repo", "path", "commit", "content").collect()))


# ------------------------------------------------------------- time travel


def test_read_as_of_timestamp(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=2,
                         merge_mode="mor")
    stamps = []
    for i in range(3):
        t.merge_batch(_mk_actions(
            spark, [("r1", "a.py", c(i + 1), 0, "upsert", "go", f"v{i}", "s")]),
            epoch=i)
        time.sleep(0.05)
        stamps.append(time.time())  # instant at which version i+1 is current
        time.sleep(0.05)

    for i, ts in enumerate(stamps):
        v = t.version_as_of(ts)
        assert v == i + 1, f"instant {i} should resolve to version {i + 1}"
        assert _state(t, as_of_unix=ts) == _state(t, version=i + 1)

    # "now" resolves to the latest version
    assert t.version_as_of(time.time()) == t.manifest()["version"]

    # an instant before the table existed must fail loudly, not resolve
    with pytest.raises(ValueError, match="no retained version"):
        t.version_as_of(stamps[0] - 3600.0)

    with pytest.raises(ValueError, match="not both"):
        t.read(version=1, as_of_unix=stamps[0])

    hist = t.history()
    assert all(h["committed_unix"] is not None for h in hist)
    # newest-first history carries non-increasing stamps (same host clock)
    su = [h["committed_unix"] for h in hist]
    assert su == sorted(su, reverse=True)


def test_as_of_respects_vacuum_horizon(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=2,
                         merge_mode="mor")
    for i in range(4):
        t.merge_batch(_mk_actions(
            spark, [("r1", "a.py", c(i + 1), 0, "upsert", "go", f"v{i}", "s")]),
            epoch=i)
    early = time.time()
    t.vacuum(keep_versions=1, grace_sec=0.0)
    # the version current at `early` was vacuumed: resolution now lands on
    # the oldest RETAINED version committed before the instant — which is
    # still <= early here, so it resolves (to the survivor), never errors
    v = t.version_as_of(early)
    t.manifest(v)  # retained


# ------------------------------------------------------- per-file row caps


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_max_records_per_file_caps_and_reads_equal(spark, warehouse, mode):
    rows = [("r%d" % (i % 7), f"f{i}.py", c(i + 1), 0, "upsert", "go",
             f"body{i}", "s") for i in range(200)]
    capped = LakeTable.create(spark, os.path.join(warehouse, "cap"),
                              num_buckets=4, merge_mode=mode,
                              max_records_per_file=16)
    plain = LakeTable.create(spark, os.path.join(warehouse, "plain"),
                             num_buckets=4, merge_mode=mode)
    for t in (capped, plain):
        t.merge_batch(_mk_actions(spark, rows), epoch=0)

    fes = capped.file_entries()
    assert max(int(fe["rows"]) for fe in fes) <= 16
    assert len(fes) > len(plain.file_entries())
    assert _state(capped) == _state(plain)

    # compact re-rolls under the cap and stays equal
    capped.compact()
    fes2 = capped.file_entries()
    assert max(int(fe["rows"]) for fe in fes2) <= 16
    assert _state(capped) == _state(plain)

    # altering the cap is a metadata commit that future writes honor
    plain.set_max_records_per_file(16)
    plain.merge_batch(_mk_actions(spark, [
        ("rX", f"g{i}.py", c(500 + i), 0, "upsert", "go", "b", "s")
        for i in range(100)]), epoch=1)
    newest = plain.manifest()["shards"][-1]
    new_entries = plain._load_shard(newest["path"])
    assert max(int(fe["rows"]) for fe in new_entries) <= 16


# ----------------------------------------------------------------- fsck


def _mk_table(spark, warehouse, name="t"):
    t = LakeTable.create(spark, os.path.join(warehouse, name), num_buckets=2,
                         merge_mode="mor")
    for i in range(3):
        t.merge_batch(_mk_actions(
            spark, [("r1", f"a{i}.py", c(i + 1), 0, "upsert", "go", "v", "s")]),
            epoch=i)
    return t


def test_fsck_green_on_healthy_table(spark, warehouse):
    t = _mk_table(spark, warehouse)
    t.create_tag("rel")
    rep = t.fsck(check_footers=True)
    assert rep["ok"], rep["errors"]
    assert rep["checked_files"] >= 3
    assert rep["checked_shards"] >= 3
    assert rep["checked_refs"] == 1


def test_fsck_detects_missing_and_truncated_files(spark, warehouse):
    t = _mk_table(spark, warehouse)
    fes = t.file_entries()
    os.remove(os.path.join(t.path, fes[0]["path"]))
    with open(os.path.join(t.path, fes[1]["path"]), "ab") as f:
        f.write(b"\x00")  # size drift without touching the footer check
    rep = t.fsck()
    assert not rep["ok"]
    assert any("missing data file" in e for e in rep["errors"])
    assert any("size mismatch" in e for e in rep["errors"])


def test_fsck_detects_descriptor_and_footer_drift(spark, warehouse):
    t = _mk_table(spark, warehouse)
    mani = t.manifest()
    sd = mani["shards"][0]
    shard_path = os.path.join(t.path, sd["path"])
    with open(shard_path) as f:
        entries = json.load(f)
    entries[0]["rows"] = int(entries[0]["rows"]) + 1  # footer drift
    entries.append(dict(entries[0]))                  # descriptor n drift
    with open(shard_path, "w") as f:
        json.dump(entries, f)

    fresh = LakeTable.load(t.spark, t.path)  # bypass the in-memory shard cache
    rep = fresh.fsck(check_footers=True)
    assert not rep["ok"]
    assert any("descriptor drift" in e for e in rep["errors"])
    assert any("row-count mismatch" in e for e in rep["errors"])


def test_fsck_detects_dangling_ref(spark, warehouse):
    t = _mk_table(spark, warehouse)
    t.create_tag("pin", version=1)
    os.remove(os.path.join(t.path, "manifests", "v1.json"))
    rep = t.fsck()
    assert not rep["ok"]
    assert any("dangling ref" in e for e in rep["errors"])
