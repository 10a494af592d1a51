"""Dead-letter quarantine for malformed CDC events.

A production change feed delivers rows that violate the event contract —
null key fields, unknown ops, renames without a target. The engine's LWW
fold and rename resolver assume the contract holds: a null-key row becomes
a junk state entry, an unknown op silently coerces to upsert
(`prepare_actions`' when/otherwise), a target-less rename manufactures a
``None`` key. None of those should ever reach table state, and none should
kill an otherwise-healthy epoch.

Two policies, chosen per pipeline (``on_malformed``):

- ``"error"`` (default): the epoch fails loudly BEFORE any data is staged,
  with the per-reason breakdown in the message. Matches the engine's other
  contract probes (variable-width commit ids), and keeps the
  replay == oracle equality trivially intact.
- ``"quarantine"``: malformed rows are diverted to
  ``<table>/_quarantine/epoch=<N>/`` (underscore-prefixed: invisible to
  every table read, like ``_ledger``) tagged with a ``_reason`` column;
  clean rows apply normally and the epoch commits. The write is
  ``overwrite`` per epoch directory, so a crash-and-replay of the epoch
  rewrites the identical rows (idempotent), and a REPLAY of an applied
  epoch never reaches the quarantine path at all (the epoch gate skips it
  first).

Cost model: detection rides the existing single-pass batch aggregates
(one extra sum in `batch_profile` / the fast path's ``observe``) — the
steady-state clean epoch pays one column of map-side arithmetic and zero
extra passes. Only an epoch that actually contains malformed rows pays the
split re-scan (two cheap parquet re-reads of that epoch).

Reference parity: the reference validates feed rows at ingest and skips
unusable records with a logged reason rather than aborting the run
(/root/reference/src/io/OSMDownloader.ts error paths); this is that
contract with the skipped rows retained queryably instead of logged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ops the action compiler understands (insert/update are upsert aliases in
# the reference's binlog; see operators/dedup.py prepare_actions)
VALID_OPS = ("insert", "update", "upsert", "delete", "rename")

QUARANTINE_DIR = "_quarantine"

# built lazily: Column construction needs an active SparkContext
def _null_key():
    return (
        F.col("repo").isNull()
        | F.col("path").isNull()
        | F.col("commit").isNull()
        | F.col("event_seq").isNull()
    )


def _bad_op():
    return F.col("op").isNull() | ~F.col("op").isin(*VALID_OPS)


def _bad_rename():
    return (F.col("op") == "rename") & F.col("new_path").isNull()


def malformed_cond():
    """Boolean Column: true iff the row violates the event contract.
    Null-safe by construction (each disjunct guards its own nulls)."""
    return _null_key() | _bad_op() | _bad_rename()


def malformed_reason():
    """First matching reason, aligned with malformed_cond's disjuncts."""
    return (
        F.when(_null_key(), F.lit("null_key"))
        .when(_bad_op(), F.lit("unknown_op"))
        .when(_bad_rename(), F.lit("rename_null_target"))
    )


def quarantine_epoch(lake, bad: DataFrame, epoch: int) -> int:
    """Write the epoch's malformed rows (with ``_reason``) to the table's
    quarantine area. Overwrite-per-epoch-dir => replay-idempotent. Returns
    the row count (one job: the write's observed count)."""
    from pyspark.sql import Observation

    obs = Observation()
    out = bad.withColumn("_reason", malformed_reason()).observe(
        obs, F.count(F.lit(1)).alias("n")
    )
    dest = os.path.join(lake.path, QUARANTINE_DIR, f"epoch={int(epoch)}")
    out.coalesce(1).write.mode("overwrite").parquet(dest)
    return int(obs.get["n"])


def read_quarantine(lake, epoch: int | None = None) -> DataFrame:
    """Quarantined rows (all epochs or one), with ``_reason`` and the
    ``epoch`` partition column; empty frame if nothing was quarantined."""
    base = os.path.join(lake.path, QUARANTINE_DIR)
    if not os.path.isdir(base):
        from skipmap_processor_spark.sources.events import event_spark_schema

        return lake.spark.createDataFrame(
            [], event_spark_schema().add("_reason", "string")
        )
    df = lake.spark.read.option("basePath", base).parquet(base)
    if epoch is not None:
        df = df.filter(F.col("epoch") == int(epoch))
    return df


def raise_malformed(lake, bad: DataFrame, epoch: int) -> None:
    """error-policy failure: per-reason breakdown in the message. Runs one
    small aggregate over the malformed subset (rare path)."""
    counts = (
        bad.withColumn("_reason", malformed_reason())
        .groupBy("_reason").count().collect()
    )
    detail = ", ".join(f"{r['_reason']}={r['count']}" for r in counts)
    raise ValueError(
        f"epoch {epoch}: {sum(r['count'] for r in counts)} malformed "
        f"event(s) [{detail}] and on_malformed='error'; fix the feed or "
        "pass on_malformed='quarantine' to divert them to "
        f"{QUARANTINE_DIR}/ and apply the clean remainder"
    )
