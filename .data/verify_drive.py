"""Verification drive: the engine's real surface — event log on disk, tailed
by Structured Streaming, upserted into the lake, read back. Crash/resume and
redelivery probes included. Run: python .data/verify_drive.py"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from skipmap_processor_spark.lake import LakeTable
from skipmap_processor_spark.oracle import replay
from skipmap_processor_spark.session import get_spark
from skipmap_processor_spark.sources.events import (
    base_spark_schema, generate_full, write_event_log,
)
from skipmap_processor_spark.streaming.pipeline import bootstrap_base, run_stream

root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "verify_run")
shutil.rmtree(root, ignore_errors=True)
os.makedirs(root)
events_dir = os.path.join(root, "events")
ckpt = os.path.join(root, "ckpt")
lake_dir = os.path.join(root, "lake")

spark = get_spark(master="local[4]", shuffle_partitions=4, driver_memory="4g")
base, ev, ddl = generate_full(n_repos=12, n_base_paths=100, n_events=800, n_epochs=6)
epochs = sorted(ev["epoch"].unique())

# STEP 1: write only the first half of the log, tail it, then "crash"
write_event_log(events_dir, ev, ddl, epochs=epochs[:3])
lake = LakeTable.create(spark, lake_dir, num_buckets=8, merge_mode="mor")
bootstrap_base(lake, spark.createDataFrame(base, schema=base_spark_schema()))

applied = []
q = run_stream(spark, lake, events_dir, ckpt,
               on_batch=lambda s: applied.append(s["epoch"]))
q.awaitTermination()
print("STEP1 applied epochs:", applied, "HWM:", lake.hwm_epoch)
assert applied == epochs[:3]

# STEP 2: resume — remaining epochs arrive, same checkpoint
write_event_log(events_dir, ev, ddl, epochs=epochs[3:])
applied2 = []
q = run_stream(spark, lake, events_dir, ckpt,
               on_batch=lambda s: applied2.append(s["epoch"]))
q.awaitTermination()
print("STEP2 resumed epochs:", applied2, "HWM:", lake.hwm_epoch)
assert applied2 == epochs[3:]

# STEP 3: final state equals oracle, sha-for-sha
engine = lake.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
oracle = replay(base, ev, ddl)
cols = sorted(oracle.columns)
pd.testing.assert_frame_equal(
    engine[cols].reset_index(drop=True).astype({"event_seq": "int64"}),
    oracle[cols].reset_index(drop=True).astype({"event_seq": "int64"}),
    check_dtype=False,
)
print("STEP3 final state == oracle:", len(engine), "rows; cols:", cols)

# PROBE A: blow away the checkpoint and re-tail everything (redelivery storm)
shutil.rmtree(ckpt)
applied3 = []
q = run_stream(spark, lake, events_dir, os.path.join(root, "ckpt2"),
               on_batch=lambda s: applied3.append((s["epoch"], s.get("skipped"))))
q.awaitTermination()
print("PROBE A redelivery (fresh checkpoint):", applied3)
assert all(sk for _, sk in applied3), "HWM must skip every redelivered epoch"
engine2 = lake.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
pd.testing.assert_frame_equal(engine[cols], engine2[cols], check_dtype=False)
print("PROBE A state unchanged after full redelivery")

# PROBE B: schema surface — renamed + promoted columns visible, sha 64-hex
assert "language" in engine.columns and "lang" not in engine.columns
assert "branch" in engine.columns
assert engine[engine.content.notna()]["content_sha"].str.len().eq(64).all()
print("PROBE B schema evolution visible at read surface; shas valid")

# PROBE C: time travel to the pre-stream snapshot still works
v_rows = lake.read(version=1).count()
print("PROBE C time-travel read of v1 snapshot rows:", v_rows)

# PROBE D: compaction folds MOR deltas without changing visible state
lake.compact(target_files_per_bucket=1)
assert not lake.manifest()["properties"]["has_deltas"]
engine3 = lake.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
pd.testing.assert_frame_equal(engine[cols], engine3[cols], check_dtype=False)
print("PROBE D compaction preserved state; deltas folded")

print("VERIFY_DRIVE_OK")
spark.stop()
