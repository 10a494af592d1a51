"""Profile where one epoch's time goes."""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from bench.cdc_bench import ensure_event_log
from skipmap_processor_spark.lake import LakeTable
from skipmap_processor_spark.operators.dedup import lww_dedup, prepare_actions
from skipmap_processor_spark.session import get_spark
from skipmap_processor_spark.streaming.pipeline import apply_epoch

events_dir = ensure_event_log(100000, 500000, 5)
spark = get_spark(master="local[32]", shuffle_partitions=32, driver_memory="16g")
lake_dir = "/root/repo/.data/profile_lake"
shutil.rmtree(lake_dir, ignore_errors=True)
lake = LakeTable.create(spark, lake_dir, num_buckets=32)
ev = spark.read.parquet(events_dir)

# warm up: epoch 0 fully
t = time.monotonic(); apply_epoch(lake, ev.filter("epoch=0").drop("epoch"), 0)
print("epoch0 full:", round(time.monotonic() - t, 2))

b = ev.filter("epoch=1").drop("epoch").persist()
t = time.monotonic(); n = b.count(); print("read+persist:", round(time.monotonic()-t,2), n)
t = time.monotonic(); b.select(F.explode(F.map_keys("extra_cols")).alias("k")).distinct().collect(); print("promote scan:", round(time.monotonic()-t,2))
t = time.monotonic(); d = b.dropDuplicates(["commit","event_seq"]); w = lww_dedup(d, 8); w.count(); print("dedup windows:", round(time.monotonic()-t,2))
t = time.monotonic(); acts = prepare_actions(b, lake, 8, "arrow"); acts.count(); print("prepare+sha(arrow) count:", round(time.monotonic()-t,2))
t = time.monotonic(); acts2 = prepare_actions(b, lake, 8, "jvm"); acts2.count(); print("prepare+sha(jvm) count:", round(time.monotonic()-t,2))
t = time.monotonic(); st = lake.merge_batch(prepare_actions(b, lake, 8, "jvm"), 1); print("merge total:", round(time.monotonic()-t,2), st["rows_written"])
t = time.monotonic(); old = lake.read(include_deleted=True, with_engine_cols=True); old.count(); print("read table:", round(time.monotonic()-t,2))
spark.stop()
