"""Generator invariants (FIXTURES.md §2) and oracle sanity."""

from __future__ import annotations

import numpy as np

from skipmap_processor_spark.oracle import replay
from skipmap_processor_spark.sources.events import generate_full


def test_generator_deterministic():
    b1, e1, d1 = generate_full(n_events=300, n_epochs=4)
    b2, e2, d2 = generate_full(n_events=300, n_epochs=4)
    assert b1.equals(b2)
    assert e1.equals(e2)
    assert d1.equals(d2)


def test_generator_covers_required_cases():
    base, ev, ddl = generate_full(n_events=1000, n_epochs=5)
    assert set(ev["op"].unique()) == {"insert", "update", "delete", "rename"}
    # duplicate deliveries: same (commit,event_seq) in >1 epoch
    dups = ev.groupby(["commit", "event_seq"])["epoch"].nunique()
    assert (dups > 1).any()
    # in-batch key collisions: >=2 events same key same epoch, distinct ords
    coll = ev[ev["op"] == "update"].groupby(["epoch", "repo", "path"]).size()
    assert (coll >= 2).any()
    # rename chains within one epoch: a rename whose source is another
    # rename's target in the same epoch
    rn = ev[ev["op"] == "rename"]
    chained = rn.merge(
        rn, left_on=["epoch", "repo", "new_path"], right_on=["epoch", "repo", "path"]
    )
    assert len(chained) > 0
    # hot-key skew: one repo >= 30% of events
    shares = ev["repo"].value_counts(normalize=True)
    assert shares.iloc[0] >= 0.30
    # schema evolution payload present
    assert ev["extra_cols"].map(lambda x: isinstance(x, dict) and "branch" in x).any()
    # rename-column DDL manifest present
    assert (ddl["change"] == "rename_column").any()
    # commits are 40-hex and ord-monotone with generation for originals
    assert ev["commit"].str.len().eq(40).all()


def test_oracle_replay_basics():
    base, ev, ddl = generate_full(n_events=600, n_epochs=5)
    final = replay(base, ev, ddl)
    # renamed column present, original gone
    assert "language" in final.columns and "lang" not in final.columns
    # promoted columns present
    assert "branch" in final.columns and "author" in final.columns
    # keys unique
    assert not final.duplicated(["repo", "path"]).any()
    # sha present for all live rows with content
    live_with_content = final[final["content"].notna()]
    assert live_with_content["content_sha"].str.len().eq(64).all()
    # tombstone view is a superset
    with_t = replay(base, ev, ddl, include_tombstones=True)
    assert len(with_t) >= len(final)
    assert with_t[~with_t["is_deleted"]].shape[0] == len(final)


def test_oracle_idempotent_replay():
    """Feeding the whole log twice (second copy in later epochs) is a no-op."""
    base, ev, ddl = generate_full(n_events=400, n_epochs=4)
    final1 = replay(base, ev, ddl)
    dup = ev.copy()
    dup["epoch"] = dup["epoch"] + ev["epoch"].max() + 1
    import pandas as pd

    final2 = replay(base, pd.concat([ev, dup], ignore_index=True), ddl)
    pd.testing.assert_frame_equal(final1, final2)


def test_oracle_rename_chain_semantics():
    import pandas as pd

    base = pd.DataFrame(
        [("r/a", "x.py", "0" * 40, "python", "v0")],
        columns=["repo", "path", "commit", "lang", "content"],
    )
    mk = lambda i: f"{i:016x}" + "f" * 24
    ev = pd.DataFrame(
        [
            # A -> B -> C chain in one epoch, then update C
            dict(epoch=0, event_seq=0, commit=mk(1), ts=None, op="rename",
                 repo="r/a", path="x.py", new_path="y.py", lang=None,
                 content=None, schema_ver=1, extra_cols=None),
            dict(epoch=0, event_seq=0, commit=mk(2), ts=None, op="rename",
                 repo="r/a", path="y.py", new_path="z.py", lang=None,
                 content=None, schema_ver=1, extra_cols=None),
            dict(epoch=0, event_seq=0, commit=mk(3), ts=None, op="update",
                 repo="r/a", path="z.py", new_path=None, lang="python",
                 content="v3", schema_ver=1, extra_cols=None),
        ]
    )
    final = replay(base, ev, None)
    assert final["path"].tolist() == ["z.py"]
    assert final["content"].tolist() == ["v3"]
    # rename of deleted/missing source is a no-op
    ev2 = pd.DataFrame(
        [
            dict(epoch=0, event_seq=0, commit=mk(1), ts=None, op="delete",
                 repo="r/a", path="x.py", new_path=None, lang=None,
                 content=None, schema_ver=1, extra_cols=None),
            dict(epoch=0, event_seq=0, commit=mk(2), ts=None, op="rename",
                 repo="r/a", path="x.py", new_path="y.py", lang=None,
                 content=None, schema_ver=1, extra_cols=None),
        ]
    )
    final2 = replay(base, ev2, None)
    assert len(final2) == 0


def test_oracle_tombstone_blocks_stale_dup():
    import pandas as pd

    mk = lambda i: f"{i:016x}" + "f" * 24
    base = pd.DataFrame(columns=["repo", "path", "commit", "lang", "content"])
    ev = pd.DataFrame(
        [
            dict(epoch=0, event_seq=0, commit=mk(1), ts=None, op="insert",
                 repo="r", path="p", new_path=None, lang="go", content="v1",
                 schema_ver=1, extra_cols=None),
            dict(epoch=1, event_seq=0, commit=mk(2), ts=None, op="delete",
                 repo="r", path="p", new_path=None, lang=None, content=None,
                 schema_ver=1, extra_cols=None),
            # stale duplicate of the insert, delivered after the delete
            dict(epoch=2, event_seq=0, commit=mk(1), ts=None, op="insert",
                 repo="r", path="p", new_path=None, lang="go", content="v1",
                 schema_ver=1, extra_cols=None),
        ]
    )
    final = replay(base, ev, None)
    assert len(final) == 0, "tombstone must block resurrection by stale dup"


def test_bulk_generator_shapes():
    from skipmap_processor_spark.sources.events import generate_bulk

    _, ev, _ = generate_bulk(n_keys=1000, n_events=5000, n_epochs=4)
    assert len(ev) == 5000
    assert ev["epoch"].nunique() == 4
    assert ev["commit"].is_monotonic_increasing
    shares = ev["repo"].value_counts(normalize=True)
    assert shares.iloc[0] >= 0.25
    assert (np.sort(ev["epoch"].unique()) == np.arange(4)).all()
