"""Driver contract sanity: entry() rows, queries()/oracle_sql() consistency.

Full Spark<->DuckDB value parity for every query is exercised by
`.data/check_parity.py` (driver-mimic, run at sf0.001 and sf0.01); this test
keeps the contract shape honest inside `pytest -x -q` without the full cost.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25
    # every registered query has a DuckDB oracle (r2: simhash + LSH gained
    # md5-portable twins, closing the last two no-oracle gaps)
    assert set(qs) == set(os_)


@pytest.mark.parametrize("name", ["w1_lww_dedup", "f1_content_sha",
                                  "dedup_minhash_lsh", "sim_topk_cosine"])
def test_representative_query_parity(spark, name):
    """Spot-check full value parity for four representative queries."""
    qs = entrymod.queries()
    sdf = qs[name](spark, SF).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    odf = con.execute(entrymod.oracle_sql()[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a = sdf[sorted(sdf.columns)].astype(str).sort_values(
        list(sorted(sdf.columns))).reset_index(drop=True)
    b = odf[sorted(odf.columns)].astype(str).sort_values(
        list(sorted(odf.columns))).reset_index(drop=True)
    assert a.equals(b)


def test_main_cli_batch(spark, tmp_path):
    """spark-submit entrypoint: batch replay through the CLI surface."""
    from skipmap_processor_spark.main import main
    from skipmap_processor_spark.sources.events import (
        generate_full,
        write_event_log,
    )

    base, ev, ddl = generate_full(n_repos=6, n_base_paths=40, n_events=150,
                                  n_epochs=2)
    events_dir = str(tmp_path / "ev")
    write_event_log(events_dir, ev, ddl)
    rc = main([
        "--events-dir", events_dir, "--lake", str(tmp_path / "lake"),
        "--mode", "batch", "--merge-mode", "mor", "--num-buckets", "4",
        "--master", "local[4]",
    ])
    assert rc == 0
