"""Standard CDC wire-envelope adapters (Debezium / Maxwell).

The contract under test:

1. ``parse_debezium(to_debezium(e))`` is ROW-IDENTICAL to ``e`` for the
   full fixture log (every op incl. rename chains, schema evolution,
   extra_cols) — the lossless-roundtrip guarantee that lets the change
   feed be published in Debezium format and re-consumed.
2. Hand-written envelopes in each connector's documented shapes parse to
   the right internal events (snapshot reads, key-change updates,
   Maxwell's changed-columns-only ``old``).
3. Replaying an envelope-wrapped log through the real pipeline produces
   the same final table state as replaying the internal events — the
   sequential oracle stays the single source of truth.
4. Malformed documents surface as quarantine-visible rows, never silent
   drops.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from skipmap_processor_spark.lake import LakeTable
from skipmap_processor_spark.oracle import replay
from skipmap_processor_spark.sources.envelopes import (
    parse_debezium,
    parse_maxwell,
    to_debezium,
)
from skipmap_processor_spark.sources.events import (
    base_spark_schema,
    event_spark_schema,
    generate_full,
)
from skipmap_processor_spark.streaming.pipeline import bootstrap_base, replay_log
from skipmap_processor_spark.streaming.quarantine import malformed_cond

EVENT_COLS = [
    "epoch", "event_seq", "commit", "ts", "op", "repo", "path",
    "new_path", "lang", "content", "schema_ver", "extra_cols",
]


@pytest.fixture(scope="module")
def fixtures():
    return generate_full(n_repos=10, n_base_paths=80, n_events=600, n_epochs=4)


def _events_to_spark(spark, ev: pd.DataFrame):
    records = ev.to_dict("records")
    for r in records:
        if isinstance(r.get("ts"), pd.Timestamp):
            r["ts"] = r["ts"].to_pydatetime()
    return spark.createDataFrame(records, schema=event_spark_schema())


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.select(*EVENT_COLS).toPandas()
    pdf = pdf.sort_values(["commit", "event_seq"]).reset_index(drop=True)
    # dict ordering inside the map column is not semantic
    pdf["extra_cols"] = pdf["extra_cols"].map(
        lambda m: None if m is None else tuple(sorted(m.items()))
    )
    return pdf


def test_debezium_roundtrip_exact(spark, fixtures):
    _, ev, _ = fixtures
    internal = _events_to_spark(spark, ev)
    back = parse_debezium(to_debezium(internal))
    assert back.columns == EVENT_COLS
    pd.testing.assert_frame_equal(
        _sorted_pdf(internal), _sorted_pdf(back), check_dtype=False
    )


def test_debezium_roundtrip_covers_every_op(spark, fixtures):
    _, ev, _ = fixtures
    assert set(ev["op"]) == {"insert", "update", "delete", "rename"}


def test_debezium_hand_written_shapes(spark):
    docs = [
        # snapshot read -> insert
        '{"op":"r","ts_ms":1000,"after":{"repo":"r1","path":"a.py",'
        '"commit":"c1","lang":"python","content":"x","schema_ver":1},'
        '"source":{"name":"pg","ts_ms":1000,"txId":"c1","seq":0,"epoch":7}}',
        # key-change update -> rename (old path is the event key)
        '{"op":"u","ts_ms":2000,'
        '"before":{"repo":"r1","path":"a.py","commit":"c2"},'
        '"after":{"repo":"r1","path":"b.py","commit":"c2","schema_ver":1},'
        '"source":{"name":"pg","ts_ms":2000,"txId":"c2","seq":1,"epoch":7}}',
        # delete: key comes from before, after absent
        '{"op":"d","ts_ms":3000,'
        '"before":{"repo":"r1","path":"b.py","commit":"c3","schema_ver":1},'
        '"source":{"name":"pg","ts_ms":3000,"txId":"c3","seq":2,"epoch":8}}',
        # plain update (same key) stays update
        '{"op":"u","ts_ms":4000,'
        '"before":{"repo":"r2","path":"c.go","commit":"c4"},'
        '"after":{"repo":"r2","path":"c.go","commit":"c4","lang":"go",'
        '"content":"y","schema_ver":2,"extra_cols":{"branch":"main"}},'
        '"source":{"name":"pg","ts_ms":4000,"txId":"c4","seq":3,"epoch":8}}',
    ]
    out = (
        parse_debezium(spark.createDataFrame([(d,) for d in docs], ["value"]))
        .orderBy("event_seq")
        .collect()
    )
    assert [r["op"] for r in out] == ["insert", "rename", "delete", "update"]
    ren = out[1]
    assert (ren["repo"], ren["path"], ren["new_path"]) == ("r1", "a.py", "b.py")
    assert ren["content"] is None and ren["extra_cols"] is None
    dele = out[2]
    assert (dele["repo"], dele["path"], dele["new_path"]) == ("r1", "b.py", None)
    upd = out[3]
    assert upd["extra_cols"] == {"branch": "main"} and upd["schema_ver"] == 2
    assert [r["epoch"] for r in out] == [7, 7, 8, 8]
    assert out[0]["ts"].timestamp() == 1.0  # ts_ms=1000


def test_maxwell_hand_written_shapes(spark):
    docs = [
        '{"database":"hub","table":"repos","type":"insert","ts":10,"xid":1,'
        '"data":{"repo":"r1","path":"a.py","commit":"c1","lang":"python",'
        '"content":"x","schema_ver":1}}',
        # update with non-key "old" (changed columns only) stays update
        '{"database":"hub","table":"repos","type":"update","ts":11,"xid":2,'
        '"data":{"repo":"r1","path":"a.py","commit":"c2","lang":"python",'
        '"content":"x2","schema_ver":1},"old":{"content":"x"}}',
        # update whose "old" moved the key -> rename
        '{"database":"hub","table":"repos","type":"update","ts":12,"xid":3,'
        '"data":{"repo":"r1","path":"b.py","commit":"c3","schema_ver":1},'
        '"old":{"path":"a.py"}}',
        '{"database":"hub","table":"repos","type":"delete","ts":13,"xid":4,'
        '"data":{"repo":"r1","path":"b.py","commit":"c4","schema_ver":1}}',
        '{"database":"hub","table":"repos","type":"bootstrap-insert","ts":14,'
        '"xid":5,"data":{"repo":"r2","path":"c.go","commit":"c5",'
        '"lang":"go","content":"z","schema_ver":1}}',
    ]
    out = (
        parse_maxwell(spark.createDataFrame([(d,) for d in docs], ["value"]))
        .orderBy("event_seq")
        .collect()
    )
    assert [r["op"] for r in out] == [
        "insert", "update", "rename", "delete", "insert",
    ]
    ren = out[2]
    # Maxwell "old" carries only changed columns: pre-image key is
    # old.path + data.repo
    assert (ren["repo"], ren["path"], ren["new_path"]) == ("r1", "a.py", "b.py")
    assert [r["event_seq"] for r in out] == [1, 2, 3, 4, 5]
    assert out[0]["ts"].timestamp() == 10.0


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_envelope_replay_matches_oracle(spark, warehouse, fixtures, merge_mode):
    """Tail a Debezium-wrapped log through the real pipeline: final table
    state equals the sequential oracle on the unwrapped events."""
    base, ev, ddl = fixtures
    lake = LakeTable.create(
        spark, os.path.join(warehouse, f"env_{merge_mode}"), num_buckets=4,
        merge_mode=merge_mode,
    )
    bootstrap_base(lake, spark.createDataFrame(base, schema=base_spark_schema()))
    wrapped = parse_debezium(to_debezium(_events_to_spark(spark, ev)))
    stats = replay_log(spark, lake, wrapped, ddl)
    assert all(not s["skipped"] for s in stats)

    engine = (
        lake.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    oracle = replay(base, ev, ddl)
    cols = sorted(oracle.columns)
    pd.testing.assert_frame_equal(
        engine[cols], oracle[cols], check_dtype=False
    )
    assert engine["content_sha"].equals(oracle["content_sha"])


def test_stream_tail_debezium_wire(spark, warehouse, fixtures, tmp_path):
    """run_stream(wire_format='debezium') tails a JSON-lines envelope log
    (epoch=K dirs of Debezium documents + the _ddl side-channel) and
    produces the exact oracle state — the full connector-wire path:
    text file source -> from_json decode -> LWW merge, one checkpointed
    streaming query."""
    from skipmap_processor_spark.sources.envelopes import write_envelope_log
    from skipmap_processor_spark.sources.events import write_event_log
    from skipmap_processor_spark.streaming.pipeline import run_stream

    base, ev, ddl = fixtures
    events_dir = str(tmp_path / "dbz_events")
    write_envelope_log(_events_to_spark(spark, ev), events_dir)
    # DDL rides its own side-channel (underscore dir: invisible to the
    # text source); envelope docs carry only row changes, like a binlog
    write_event_log(events_dir, ev, ddl, epochs=[])

    lake = LakeTable.create(
        spark, os.path.join(warehouse, "dbz_wire"), num_buckets=4,
        merge_mode="mor",
    )
    bootstrap_base(lake, spark.createDataFrame(base, schema=base_spark_schema()))
    q = run_stream(
        spark, lake, events_dir, str(tmp_path / "ckpt_dbz"),
        wire_format="debezium",
    )
    q.awaitTermination()

    engine = (
        lake.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    oracle = replay(base, ev, ddl)
    cols = sorted(oracle.columns)
    pd.testing.assert_frame_equal(engine[cols], oracle[cols], check_dtype=False)
    assert engine["content_sha"].equals(oracle["content_sha"])


def test_stream_tail_maxwell_wire(spark, warehouse, tmp_path):
    """Minimal Maxwell tail: hand-written documents in epoch=K dirs apply
    through the same streaming path (epoch of record = the dir)."""
    from skipmap_processor_spark.streaming.pipeline import run_stream

    events_dir = tmp_path / "mx_events"
    (events_dir / "epoch=0").mkdir(parents=True)
    (events_dir / "epoch=0" / "part-0.txt").write_text(
        '{"database":"hub","table":"repos","type":"insert","ts":10,"xid":1,'
        '"data":{"repo":"r1","path":"a.py","commit":"c1","lang":"python",'
        '"content":"x","schema_ver":1}}\n'
        '{"database":"hub","table":"repos","type":"insert","ts":11,"xid":2,'
        '"data":{"repo":"r1","path":"b.py","commit":"c2","lang":"python",'
        '"content":"y","schema_ver":1}}\n'
    )
    (events_dir / "epoch=1").mkdir()
    (events_dir / "epoch=1" / "part-0.txt").write_text(
        '{"database":"hub","table":"repos","type":"update","ts":12,"xid":3,'
        '"data":{"repo":"r1","path":"b.py","commit":"c3","lang":"python",'
        '"content":"y2","schema_ver":1},"old":{"content":"y"}}\n'
        '{"database":"hub","table":"repos","type":"delete","ts":13,"xid":4,'
        '"data":{"repo":"r1","path":"a.py","commit":"c4","schema_ver":1}}\n'
    )
    lake = LakeTable.create(
        spark, os.path.join(warehouse, "mx_wire"), num_buckets=2,
        merge_mode="mor",
    )
    q = run_stream(
        spark, lake, str(events_dir), str(tmp_path / "ckpt_mx"),
        wire_format="maxwell",
    )
    q.awaitTermination()
    rows = {
        (r["repo"], r["path"]): r["content"] for r in lake.read().collect()
    }
    assert rows == {("r1", "b.py"): "y2"}


def test_malformed_envelopes_are_quarantine_visible(spark):
    docs = [
        "this is not json",
        '{"op":"z","ts_ms":1,"after":{"repo":"r","path":"p","commit":"c"},'
        '"source":{"seq":1}}',  # unknown op
        '{"op":"c","ts_ms":1,"after":{"lang":"go"},"source":{"seq":2}}',  # no key
    ]
    parsed = parse_debezium(spark.createDataFrame([(d,) for d in docs], ["value"]))
    flagged = parsed.filter(malformed_cond()).count()
    assert flagged == 3, "every malformed document must be catchable"
