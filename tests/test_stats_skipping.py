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


# --------------------------------------------------- repo key-range skipping

def _build_repo_spread(spark, path, mode="mor", epochs=6):
    """Each epoch touches exactly one repo, so every MOR delta file's
    footer repo range is a single repo — maximally skippable."""
    t = LakeTable.create(spark, path, num_buckets=4, merge_mode=mode)
    for e in range(epochs):
        rows = [(f"repo{e:02d}", f"f{i:02d}.py", c(e + 1), i, "upsert",
                 "go", f"v{e}", "s") for i in range(8)]
        t.merge_batch(_mk_actions(spark, rows), epoch=e)
    return t


def test_repo_scoped_read_prunes_and_matches(spark, warehouse):
    from skipmap_processor_spark.lake import _prune_by_stats

    t = _build_repo_spread(spark, os.path.join(warehouse, "t"))
    full = t.read()
    for repo in ("repo02", "repo05"):
        want = sorted(tuple(r) for r in
                      full.filter(F.col("repo") == repo).collect())
        got = sorted(tuple(r) for r in t.read(repos=[repo]).collect())
        assert got == want and got, repo
        kept, skipped = _prune_by_stats(t.file_entries(), "repo", [repo])
        # only the one epoch's delta files survive the prune
        assert skipped > 0
        assert all(fe["stats"]["repo"][0] <= repo <= fe["stats"]["repo"][1]
                   for fe in kept)
    # repo outside every file's range: all files skipped, empty result
    kept, skipped = _prune_by_stats(t.file_entries(), "repo", ["zzz"])
    assert not kept and skipped == len(t.file_entries())
    assert t.read(repos=["zzz"]).count() == 0


def test_repo_scoped_read_lww_across_pruned_files(spark, warehouse):
    # repo02 written in epoch 2 AND re-written in a later epoch: the prune
    # must keep BOTH files so the LWW fold sees both versions
    t = _build_repo_spread(spark, os.path.join(warehouse, "t"))
    rows = [("repo02", f"f{i:02d}.py", c(9), i, "upsert", "go", "v9", "s")
            for i in range(4)]
    t.merge_batch(_mk_actions(spark, rows), epoch=9)
    got = {(r["path"], r["content"]) for r in
           t.read(repos=["repo02"]).collect()}
    want = {(f"f{i:02d}.py", "v9" if i < 4 else "v2") for i in range(8)}
    assert got == want


def test_lookup_repo_pruned_equality_both_modes(spark, warehouse):
    for mode in ("mor", "cow"):
        t = _build_repo_spread(spark, os.path.join(warehouse, mode),
                               mode=mode)
        keys = t.spark.createDataFrame(
            [("repo03", "f01.py"), ("repo03", "f05.py"),
             ("repo00", "f02.py"), ("nope", "f00.py")],
            "repo string, path string")
        got = sorted(tuple(r) for r in t.lookup(keys).collect())
        want = sorted(
            tuple(r) for r in t.read(include_deleted=True,
                                     with_engine_cols=True)
            .join(keys, ["repo", "path"], "left_semi").collect())
        assert got == want and len(got) == 3, mode


def test_prune_by_stats_keeps_statless_files():
    from skipmap_processor_spark.lake import _prune_by_stats

    files = [{"stats": {"repo": ["a", "c"]}},   # skippable
             {"stats": {"repo": ["c", "m"]}},   # in range
             {"stats": {}},                     # no repo stats: kept
             {}]                                # legacy, no stats: kept
    kept, skipped = _prune_by_stats(files, "repo", ["k"])
    assert skipped == 1 and len(kept) == 3


def test_path_scoped_read_prunes_and_matches(spark, warehouse):
    from skipmap_processor_spark.lake import _prune_by_stats

    t = _build(spark, os.path.join(warehouse, "tp"))
    full = t.read()
    for path in ("f03.py", "f11.py"):
        want = sorted(tuple(r) for r in
                      full.filter(F.col("path") == path).collect())
        got = sorted(tuple(r) for r in t.read(paths=[path]).collect())
        assert got == want and got, path
    # f11 only exists in epoch 0's files (later epochs write f00..f10):
    # the path range prune must skip at least those
    kept, skipped = _prune_by_stats(t.file_entries(), "path", ["f11.py"])
    assert skipped > 0
    assert all(fe["stats"]["path"][0] <= "f11.py" <= fe["stats"]["path"][1]
               for fe in kept if fe.get("stats", {}).get("path"))
    # path outside every range: empty
    assert t.read(paths=["zzz.py"]).count() == 0


def test_path_scoped_read_lww_across_pruned_files(spark, warehouse):
    # f00 is re-written in EVERY epoch: the prune must keep all its files
    # so the LWW fold picks the newest version, not a stale one
    t = _build(spark, os.path.join(warehouse, "tp2"))
    got = [(r["path"], r["content"]) for r in
           t.read(paths=["f00.py"]).collect()]
    assert got == [("f00.py", "v5")]


def test_lookup_path_pruned_equality_and_bulk_fallback(spark, warehouse):
    for mode in ("mor", "cow"):
        t = _build(spark, os.path.join(warehouse, f"lk_{mode}"), mode=mode)
        keys = t.spark.createDataFrame(
            [("r0", "f00.py"), ("r1", "f07.py"), ("r1", "f11.py"),
             ("r0", "nope.py")],
            "repo string, path string")
        got = sorted(tuple(r) for r in t.lookup(keys).collect())
        want = sorted(
            tuple(r) for r in t.read(include_deleted=True,
                                     with_engine_cols=True)
            .join(keys, ["repo", "path"], "left_semi").collect())
        assert got == want and len(got) == 3, mode

    # bulk lookup: more distinct keys than the prune cap exercises the
    # coarse (bucket, repo) fallback — equality must hold there too
    from skipmap_processor_spark.lake import _REPO_PRUNE_CAP

    t = _build(spark, os.path.join(warehouse, "lk_bulk"))
    bulk = t.spark.createDataFrame(
        [("r%d" % (i % 2), "f%02d.py" % (i % 12))
         for i in range(12)]
        + [("bulk", "x%05d" % i) for i in range(_REPO_PRUNE_CAP)],
        "repo string, path string")
    got = sorted(tuple(r) for r in t.lookup(bulk).collect())
    want = sorted(
        tuple(r) for r in t.read(include_deleted=True,
                                 with_engine_cols=True)
        .join(bulk, ["repo", "path"], "left_semi").collect())
    assert got == want and len(got) == 12


# --------------------------------------------------------------- membership

def test_build_members_exact_bloom_and_caps():
    from skipmap_processor_spark.lake import (_MEMBER_EXACT_CAP,
                                              _MEMBER_MAX_DISTINCT,
                                              _build_members,
                                              _members_may_contain)

    # exact set below the cap (dups and Nones dropped)
    mem = _build_members(["b", "a", "b", None])
    assert mem == {"s": ["a", "b"]}
    assert _members_may_contain(mem, ["b"]) and not _members_may_contain(mem, ["c"])

    # bloom past the exact cap: zero false negatives, useful rejection rate
    vals = ["repo_%04d" % i for i in range(_MEMBER_EXACT_CAP + 76)]
    mem = _build_members(vals)
    assert "b" in mem
    assert all(_members_may_contain(mem, [v]) for v in vals)
    fps = sum(_members_may_contain(mem, ["absent_%05d" % i])
              for i in range(1000))
    assert fps < 100  # ~1% design point; 10% is the generous bound

    # past the distinct cap membership cannot prune: store nothing
    assert _build_members(["r%d" % i for i in range(_MEMBER_MAX_DISTINCT + 1)]) is None
    assert _build_members([]) is None


def test_prune_by_members_keeps_summaryless_files():
    from skipmap_processor_spark.lake import _build_members, _prune_by_members

    files = [
        {"path": "legacy"},                                    # no summary
        {"path": "hit", "members": {"repo": _build_members(["rA", "rZ"])}},
        {"path": "miss", "members": {"repo": _build_members(["rB", "rY"])}},
    ]
    kept, skipped = _prune_by_members(files, "repo", ["rZ"])
    assert [f["path"] for f in kept] == ["legacy", "hit"] and skipped == 1


def _build_scattered(spark, path, mode="mor"):
    """Epochs each touch a SCATTERED repo pair: every file's footer repo
    RANGE spans nearly the whole repo space, so the min/max prune keeps
    everything and only the membership summary can skip."""
    t = LakeTable.create(spark, path, num_buckets=2, merge_mode=mode)
    pairs = [("repo_000", "repo_999"), ("repo_111", "repo_888"),
             ("repo_222", "repo_777"), ("repo_333", "repo_666")]
    for e, (ra, rb) in enumerate(pairs):
        rows = [(r, "f%d.py" % i, c(e + 1), i, "upsert", "go",
                 "%s@%d" % (r, e), "s")
                for r in (ra, rb) for i in range(3)]
        t.merge_batch(_mk_actions(spark, rows), epoch=e)
    return t


def test_membership_prunes_scattered_epochs_and_read_is_exact(spark, warehouse):
    from skipmap_processor_spark.lake import (_prune_by_members,
                                              _prune_by_stats)

    for mode in ("mor", "cow"):
        t = _build_scattered(spark, os.path.join(warehouse, "sc_" + mode), mode)
        fes = t.file_entries()
        assert all(fe.get("members", {}).get("repo") for fe in fes), mode

        # the range prune is useless on scattered epochs; membership is not
        by_range, _ = _prune_by_stats(fes, "repo", ["repo_333"])
        kept, skipped = _prune_by_members(by_range, "repo", ["repo_333"])
        if mode == "mor":
            # range keeps straddlers (e.g. [repo_222, repo_777] admits
            # repo_333); membership skips them, leaving exactly the files
            # that truly wrote the repo (exact sets here: assert precisely)
            assert skipped > 0 and len(kept) < len(by_range)
            assert all("repo_333" in fe["members"]["repo"]["s"] for fe in kept)
        # CoW rewrites whole buckets so later files hold many repos; the
        # assertions below (read equality) are the contract there

        # repo-scoped read == brute-force filter of the full read
        got = sorted(tuple(r) for r in t.read(repos=["repo_333"]).collect())
        want = sorted(tuple(r) for r in
                      t.read().filter(F.col("repo") == "repo_333").collect())
        assert got == want and len(got) == 3, mode


def test_membership_survives_compact_and_changefeed_equality(spark, warehouse):
    from skipmap_processor_spark.changefeed import table_changes

    t = _build_scattered(spark, os.path.join(warehouse, "sc_cf"), "mor")
    v_mid = t._latest_version()
    rows = [("repo_555", "g.py", c(9), 0, "upsert", "go", "new", "s")]
    t.merge_batch(_mk_actions(spark, rows), epoch=10)

    # changefeed over the last commit: base-file membership prune must not
    # change the feed (repo_555 never existed before -> pure insert)
    ch = table_changes(t, v_mid, t._latest_version())
    got = [(r["repo"], r["path"], r["_change_type"]) for r in ch.collect()]
    assert got == [("repo_555", "g.py", "insert")]

    # compact() folds deltas; the folded files must carry fresh summaries
    t.compact()
    fes = t.file_entries()
    assert fes and all(fe.get("members", {}).get("repo") for fe in fes)
    got = sorted(tuple(r) for r in t.read(repos=["repo_555"]).collect())
    assert len(got) == 1
