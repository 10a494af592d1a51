"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship CDC op (LWW snapshot) on sf0.001.
``queries`` — SURVEY.md §2 operator inventory + training-data-pipeline ops
              (dedup / similarity / text analysis), each (spark, sf_dir) ->
              DataFrame; see skipmap_processor_spark/plans/queries.py for
              the §2 coverage map (COVERAGE dict).
``oracle_sql`` — DuckDB twins, one per query (every registered query is
              hash-checked against DuckDB; the simhash/LSH hash math is
              mirrored in SQL via md5-prefix families).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from skipmap_processor_spark.plans.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: last-writer-wins keyed snapshot (the CDC core op, W1/S8)."""
    return QUERIES["w1_lww_dedup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
