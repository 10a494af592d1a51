"""skipmap_processor_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the *semantics* of the reference pipeline
(riemann-spatial/skipmap_processor, /root/reference) on Spark:

- upsert-by-key with last-writer-wins dedup
  (reference: src/io/PostGISDataStore.ts:75-85, 829-850)
- resumable phases / idempotent replay
  (reference: run.sh:7-80, docs/control-flow.md:115-126)
- incremental gap-fill ledger / applied-epoch high-water marks
  (reference: snow-cover/src/snow_cover_sqlite_archive.py:125-155)
- content-hash row identity
  (reference: src/transforms/FeatureBuilder.ts:8-14)
- dynamic-JSON -> typed-column schema promotion
  (reference: src/io/PostGISDataStore.ts:800-827)

The execution engine is DataFrame/Catalyst + Structured Streaming; no code is
ported from the reference's Node stream engine.
"""

__version__ = "0.1.0"
