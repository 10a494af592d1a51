"""Live-trigger streaming soak: files landing mid-query, late epochs,
crash + resume — the reference's true run mode (a continuously-tailing
daemon, /root/reference/run.sh:7-80), not the availableNow drain the rest
of the suite uses.

Covers VERDICT r3 item 7: run_stream(available_now=False) with epoch dirs
arriving WHILE the query runs, including a late ``epoch=K`` dir landing
after K+1 was already processed (missing_intervals observed non-empty,
then empty once the gap fills), then a crash mid-stream and a resume from
the same checkpoint. Final state must equal the sequential oracle.
"""

from __future__ import annotations

import time

import pandas as pd

from skipmap_processor_spark.lake import LakeTable
from skipmap_processor_spark.oracle import replay
from skipmap_processor_spark.sources.events import (
    base_spark_schema,
    generate_full,
    write_event_log,
)
from skipmap_processor_spark.streaming.pipeline import (
    bootstrap_base,
    run_stream,
)


def _wait_until(cond, timeout_s: float = 180.0, poll_s: float = 0.5):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if cond():
            return
        time.sleep(poll_s)
    raise AssertionError(f"condition not met within {timeout_s}s")


def test_live_trigger_soak_late_epoch_and_crash_resume(spark, tmp_path):
    base, ev, ddl = generate_full(n_repos=10, n_base_paths=80, n_events=600,
                                  n_epochs=6)
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    epochs = sorted(int(e) for e in ev["epoch"].unique())
    assert len(epochs) == 6

    lake = LakeTable.create(spark, str(tmp_path / "lake"), num_buckets=8,
                            merge_mode="mor")
    bootstrap_base(
        lake, spark.createDataFrame(base, schema=base_spark_schema()))

    applied: list[int] = []
    # LIVE trigger: the query keeps polling the directory; nothing exists
    # yet at start — the soak begins with an empty source
    write_event_log(events_dir, ev, ddl, epochs=[])  # ddl only
    q = run_stream(spark, lake, events_dir, ckpt, available_now=False,
                   on_batch=lambda s: applied.append(s["epoch"]))
    try:
        # epochs 0,1 land while the query is live
        write_event_log(events_dir, ev, ddl, epochs=epochs[:2])
        _wait_until(lambda: applied[-2:] == epochs[:2])
        assert lake.hwm_epoch == epochs[1]
        assert lake.missing_intervals() == []

        # epoch 3 lands BEFORE epoch 2 (late/out-of-order delivery at the
        # file level): the gap opens and is tracked
        write_event_log(events_dir, ev, ddl, epochs=[epochs[3]])
        _wait_until(lambda: epochs[3] in applied)
        assert lake.hwm_epoch == epochs[3]
        assert lake.missing_intervals() == [[epochs[2], epochs[2]]]

        # the late epoch 2 dir arrives while the query is still live —
        # it must APPLY (not drop) and close the gap
        write_event_log(events_dir, ev, ddl, epochs=[epochs[2]])
        _wait_until(lambda: epochs[2] in applied)
        assert lake.missing_intervals() == []
        assert lake.hwm_epoch == epochs[3]
    finally:
        # crash mid-stream (epochs 4,5 not yet delivered)
        q.stop()

    # remaining epochs land while the engine is down; resume from the SAME
    # checkpoint with a live trigger again
    write_event_log(events_dir, ev, ddl, epochs=epochs[4:])
    stats2: list[dict] = []
    q = run_stream(spark, lake, events_dir, ckpt, available_now=False,
                   on_batch=stats2.append)
    try:
        _wait_until(lambda: {s["epoch"] for s in stats2} >= set(epochs[4:]))
    finally:
        q.stop()
    # exactly-once: every pre-crash epoch the checkpoint redelivers (a crash
    # can land between batch apply and checkpoint commit) is gated to a
    # skip; only the new epochs actually APPLY
    applied2 = sorted(s["epoch"] for s in stats2 if not s.get("skipped"))
    assert applied2 == epochs[4:]
    assert sorted(applied + applied2) == epochs

    engine = (lake.read().toPandas()
              .sort_values(["repo", "path"]).reset_index(drop=True))
    oracle = replay(base, ev, ddl)
    cols = sorted(oracle.columns)
    pd.testing.assert_frame_equal(
        engine[cols].astype({"event_seq": "int64"}),
        oracle[cols].astype({"event_seq": "int64"}),
        check_dtype=False,
    )
