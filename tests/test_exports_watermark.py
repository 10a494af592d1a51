"""Export sinks (S11/S12) + event-time watermark dedup demo (I11)."""

from __future__ import annotations

import glob
import json
import os

from skipmap_processor_spark.lake import LakeTable


def _mk_actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, op string, "
        "lang string, content string, content_sha string",
    )


def test_export_json_csv(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), num_buckets=2)
    t.merge_batch(
        _mk_actions(
            spark,
            [("r1", "a.py", "c1", 0, "upsert", "go", "hello", "s1"),
             ("r2", "b.py", "c2", 0, "upsert", "rust", "world", "s2")],
        ),
        epoch=0,
    )
    jdir = os.path.join(warehouse, "json_out")
    t.export_json(jdir)
    rows = []
    for f in glob.glob(os.path.join(jdir, "part-*")):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    assert {r["repo"] for r in rows} == {"r1", "r2"}

    cdir = os.path.join(warehouse, "csv_out")
    t.export_csv(cdir)
    back = spark.read.option("header", True).csv(cdir)
    assert back.count() == 2
    assert "content_sha" in back.columns


def test_streaming_watermark_dedup(spark, tmp_path):
    """I11: event-time watermark bounds dedup state in pure-streaming mode.

    The engine's exactly-once path uses the ord gate (unbounded total
    order), but the watermarked dropDuplicates variant is the built-in
    Structured Streaming tool for at-least-once sources with bounded
    lateness — demonstrated against the rate-free file source.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    t0 = pd.Timestamp("2026-01-01")
    pdf = pd.DataFrame(
        {
            "commit": ["c1", "c2", "c1", "c3"],  # c1 delivered twice
            "event_seq": [0, 0, 0, 0],
            "ts": [t0, t0 + pd.Timedelta("1min"), t0, t0 + pd.Timedelta("2min")],
            "repo": ["r"] * 4,
            "path": ["p"] * 4,
        }
    )
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    # Spark's schema expects µs timestamps; pandas defaults to ns
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"), "ts",
        tbl.column("ts").cast(pa.timestamp("us")),
    )
    pq.write_table(tbl, str(src / "part-0.parquet"))

    sdf = (
        spark.readStream.schema(
            "commit string, event_seq bigint, ts timestamp, "
            "repo string, path string"
        )
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["commit", "event_seq"])
    )
    out = []
    q = (
        sdf.writeStream.foreachBatch(
            lambda df, _: out.extend(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(r["commit"] for r in out) == ["c1", "c2", "c3"]
