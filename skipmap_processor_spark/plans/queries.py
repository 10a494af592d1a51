"""Query registry: every SURVEY.md §2 operator class, re-expressed over the
driver's testdata tables, each with a DuckDB oracle (ANSI SQL) twin.

Registry contract (driver, /root/repo/__spark_entry__.py):
  QUERIES[name](spark, sf_dir) -> DataFrame
  ORACLE_SQL[name] = equivalent DuckDB SQL over pre-registered views
  COVERAGE[name]   = SURVEY §2 operator ids the query exercises

Parity rules used throughout (so order-insensitive value-hashes match):
- every computed column aliased identically on both sides;
- doubles rounded (sums 4dp, ratios/avgs 6dp, cosine 5dp);
- counts cast to bigint; float->int via explicit floor();
- Spark to_date(ts) <-> DuckDB CAST(ts AS DATE);
- portable hashes only (md5/sha2), never xxhash64/hash;
- top-k always ordered by (rounded measure desc, unique key) so ties are
  deterministic.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from skipmap_processor_spark.functions.udfs import normalize_content_expr
from skipmap_processor_spark.operators import dedup_docs, similarity, text

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}
COVERAGE: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str,
       wide: bool = False) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Scan-parallelism floor (guide S2.5 "input skew: one huge
    # unsplittable file -> repartition immediately after the read"):
    # parquet scan parallelism is bounded by ROW GROUPS, and the fixture
    # tables are written as one row group per file — so the scan is ONE
    # task no matter how expensive the per-row work above it is (at sf1.0
    # the 1M-row events table is 15 MB -> a JSON-roundtrip query ran
    # 1-of-32 cores; maxPartitionBytes/minPartitionNum cannot split
    # inside a row group). ``wide=True`` — set by the queries whose
    # per-row work dwarfs the scan (JSON roundtrip, shingling, vector
    # math, media decode; each measured faster with it at sf1.0) —
    # round-robins such a table across the session parallelism for the
    # cost of shuffling a few MB. Cheap scan-shaped queries keep the
    # 1-task scan: the exchange costs more than it buys there. The
    # repartition is skipped when the table already splits into enough
    # row groups (the 100 TB shape) or is broadcast-small; both bounds
    # scale with core count, not the fixture.
    if not wide:
        return df
    path = f"{sf_dir}/{name}.parquet"
    par = spark.sparkContext.defaultParallelism
    key = (path, par)
    nparts = _SCAN_FLOOR_CACHE.get(key)
    if nparts is None:
        nparts = 1
        try:
            size = os.path.getsize(path)
            if 1024 * 1024 <= size <= par * 64 * 1024 * 1024:
                import pyarrow.parquet as _pq
                if _pq.ParquetFile(path).metadata.num_row_groups <= par // 4:
                    nparts = par
        except Exception:
            pass
        _SCAN_FLOOR_CACHE[key] = nparts
    if nparts > 1:
        df = df.repartition(int(nparts))
    return df


_SCAN_FLOOR_CACHE: dict[tuple[str, int], int] = {}


def q(name: str, covers: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        COVERAGE[name] = covers
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------

@q(
    "a1_pricing_rollup",
    "A1,A7,P1",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4)                            AS sum_qty,
           ROUND(SUM(l_extendedprice), 4)                       AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)    AS sum_disc_price,
           ROUND(AVG(l_quantity), 6)                            AS avg_qty,
           ROUND(AVG(l_discount), 6)                            AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                             AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_rollup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 4
        ).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").cast("bigint").alias("count_order"),
    )


@q(
    "a2_collect_set_union",
    "A2",
    """
    SELECT n_name,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(c_mktsegment))), ',')
               AS segments,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def a2_collect_set_union(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
            F.count("*").cast("bigint").alias("n_customers"),
        )
    )


@q(
    "a3_argmax_priority_pick",
    "A3,W2",
    """
    SELECT event_type, event_id AS top_event_id, ROUND(value, 6) AS top_value
    FROM (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def a3_argmax_priority_pick(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("event_id").alias("top_event_id"),
            F.round("value", 6).alias("top_value"),
        )
    )


@q(
    "a6_temporal_rollup",
    "A6,F12",
    """
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(value), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def a6_temporal_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------

@q(
    "j1_broadcast_lookup_join",
    "J1,J6",
    """
    SELECT r_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(c_acctbal), 6) AS avg_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def j1_broadcast_lookup_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
        )
    )


@q(
    "j4_left_join_group_agg",
    "J4",
    """
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           ROUND(SUM(COALESCE(o.o_totalprice, 0)), 4) AS total_spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c_mktsegment
    """,
)
def j4_left_join_group_agg(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").cast("bigint").alias("n_customers"),
            F.count("o_orderkey").cast("bigint").alias("n_orders"),
            F.round(F.sum(F.coalesce("o_totalprice", F.lit(0))), 4).alias(
                "total_spend"
            ),
        )
    )


@q(
    "j5_anti_join",
    "J5,J8,§2.7-except",
    """
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers_no_orders
    FROM customer c
    JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    GROUP BY n_name
    """,
)
def j5_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").cast("bigint").alias("n_customers_no_orders"))
    )


@q(
    "j3_semi_join",
    "J3",
    """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_nationkey IN (
      SELECT c_nationkey FROM customer WHERE c_acctbal > 9000
    )
    """,
)
def j3_semi_join(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    rich_nations = c.filter(F.col("c_acctbal") > 9000).select("c_nationkey")
    return s.join(
        rich_nations, s.s_nationkey == rich_nations.c_nationkey, "left_semi"
    ).select("s_suppkey", "s_name")


@q(
    "j9_union_merge",
    "J9,S16,§2.7-union",
    """
    SELECT kind, CAST(COUNT(*) AS BIGINT) AS n, ROUND(AVG(acctbal), 6) AS avg_bal
    FROM (
      SELECT 'customer' AS kind, c_acctbal AS acctbal FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_acctbal AS acctbal FROM supplier
    ) GROUP BY kind
    """,
)
def j9_union_merge(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_acctbal").alias("acctbal")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_acctbal").alias("acctbal")
    )
    return c.unionByName(s).groupBy("kind").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("acctbal"), 6).alias("avg_bal"),
    )


@q(
    "set_except_distinct",
    "§2.7-except,J8",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    filled = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.subtract(filled)  # EXCEPT DISTINCT semantics


# ---------------------------------------------------------------------------
# Windows / ordered semantics (SURVEY §2.5, §2.6)
# ---------------------------------------------------------------------------

@q(
    "w1_lww_dedup",
    "W1,S8,A9,I2",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           ROUND(value, 6) AS last_value
    FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def w1_lww_dedup(spark, sf_dir):
    """The CDC headline op on driver data: last-writer-wins snapshot per key
    (reference semantics: /root/reference/src/io/PostGISDataStore.ts:75-85)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.round("value", 6).alias("last_value"),
        )
    )


@q(
    "w2_topk_per_group",
    "W2,§2.6-topk",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rank
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def w2_topk_per_group(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.col("rn").cast("int").alias("rank"),
        )
    )


@q(
    "s5_order_limit_topk",
    "S5,§2.6-sort-limit",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def s5_order_limit_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Projections / filters / scalar functions (SURVEY §2.2, §2.8)
# ---------------------------------------------------------------------------

@q(
    "p1_filter_project",
    "P1,P3,F11",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 6) AS revenue
    FROM lineitem
    WHERE l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 10
    """,
)
def p1_filter_project(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 10)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 6
        ).alias("revenue"),
    )


@q(
    "p5_explode_tokens",
    "P5,P4,F7",
    """
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    )
    WHERE LENGTH(token) > 3
    GROUP BY token HAVING COUNT(*) >= 5
    """,
)
def p5_explode_tokens(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 3)
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("n"))
        .filter(F.col("n") >= 5)
    )


@q(
    "f5_string_assembly",
    "F5,F7,F16",
    """
    SELECT p_partkey,
           LOWER(REGEXP_REPLACE(p_brand, '#', '_', 'g')) AS brand_norm,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(p_type, ' '))), '-')
               AS type_tokens,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len
    FROM part
    """,
)
def f5_string_assembly(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower(F.regexp_replace("p_brand", "#", "_")).alias("brand_norm"),
        F.array_join(
            F.array_sort(F.array_distinct(F.split("p_type", " "))), "-"
        ).alias("type_tokens"),
        F.length("p_name").cast("bigint").alias("name_len"),
    )


@q(
    "f4_coercion_clamp",
    "F4,F13,F14,A5",
    """
    SELECT p_partkey,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           ROUND(GREATEST(LEAST(p_retailprice, 1500.0), 950.0), 4) AS price_clamped,
           (p_size >= 25) AS is_large,
           COALESCE(NULLIF(p_brand, ''), 'unknown') AS brand_or_unknown
    FROM part
    """,
)
def f4_coercion_clamp(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.round(
            F.greatest(F.least(F.col("p_retailprice"), F.lit(1500.0)), F.lit(950.0)),
            4,
        ).alias("price_clamped"),
        (F.col("p_size") >= 25).alias("is_large"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("")), F.lit("unknown")).alias(
            "brand_or_unknown"
        ),
    )


@q(
    "f15_json_extract",
    "F15,F4",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_k,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k
    FROM events GROUP BY event_type
    """,
)
def f15_json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.count(F.get_json_object("props", "$.k")).cast("bigint").alias("n_with_k"),
    )


@q(
    "f2_portable_key_hash",
    "F2",
    """
    SELECT event_id,
           SUBSTRING(md5(CAST(user_id AS VARCHAR) || ':' || event_type), 1, 8)
               AS key_hash
    FROM events
    """,
)
def f2_portable_key_hash(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":"),
                           F.col("event_type"))),
            1, 8,
        ).alias("key_hash"),
    )


@q(
    "f1_content_sha",
    "F1,I2",
    """
    SELECT doc_id,
           sha256(
             REGEXP_REPLACE(
               REGEXP_REPLACE(
                 REGEXP_REPLACE(text, '\\r\\n|\\r', chr(10), 'g'),
                 '[ \\t]+' || chr(10), chr(10), 'g'),
               '[ \\t]+$', '', 'g')
           ) AS content_sha
    FROM documents
    """,
)
def f1_content_sha(spark, sf_dir):
    """The per-row identity invariant of the CDC engine, over documents."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lower(F.sha2(normalize_content_expr(F.col("text")), 256)).alias(
            "content_sha"
        ),
    )


@q(
    "s18_view_sql",
    "S18,A1",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(AVG(o_totalprice), 6) AS avg_price
    FROM orders WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    """,
)
def s18_view_sql(spark, sf_dir):
    """SQL-text surface over a registered view (reference: CREATE OR REPLACE
    VIEW definitions, /root/reference/src/io/PostGISDataStore.ts:420-572)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(AVG(o_totalprice), 6) AS avg_price
        FROM orders_v WHERE o_orderstatus <> 'F'
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Dedup ops over documents (training-data pipeline)
# ---------------------------------------------------------------------------

@q(
    "dedup_exact",
    "S8,F1",
    """
    SELECT sha256(text) AS text_sha,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark, sf_dir):
    return dedup_docs.exact_dup_groups(_t(spark, sf_dir, "documents"))


_SHINGLE_CTE = """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS tok FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(tok) - 1),
                    i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) AS shingle
      FROM tok WHERE len(tok) >= 3
    )
"""


@q(
    "dedup_ngram_jaccard",
    "J7,A4",
    _SHINGLE_CTE
    + """
    , freq AS (
      SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 100
    ), shf AS (
      SELECT sh.doc_id, sh.shingle FROM sh JOIN freq USING (shingle)
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM shf GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id,
           ROUND(n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6)
               AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = a_id
    JOIN sizes sb ON sb.doc_id = b_id
    WHERE ROUND(n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    return dedup_docs.jaccard_pairs(
        _t(spark, sf_dir, "documents", wide=True), n=3, threshold=0.2, max_shingle_freq=100
    )


@q(
    "dedup_minhash_lsh",
    "J2,F2,S8",
    _SHINGLE_CTE
    + """
    , hh AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(shingle), 1, 8))::UBIGINT AS BIGINT) AS h1,
             CAST(('0x' || substring(md5(shingle), 9, 8))::UBIGINT AS BIGINT) AS h2
      FROM sh
    ), sig AS (
      SELECT doc_id, h.hidx, MIN((h1 + h.hidx * h2) % 4294967296) AS minhash
      FROM hh CROSS JOIN (SELECT unnest(range(0, 16)) AS hidx) h
      GROUP BY doc_id, h.hidx
    ), bands AS (
      SELECT doc_id, CAST(FLOOR(hidx / 4) AS INT) AS band,
             STRING_AGG(CAST(minhash AS VARCHAR), ',' ORDER BY hidx) AS sig
      FROM sig GROUP BY doc_id, 2
    )
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    return dedup_docs.minhash_lsh_candidates(
        _t(spark, sf_dir, "documents", wide=True), n=3, num_hashes=16, bands=4
    )


@q("dedup_simhash", "F2,F10,S8", dedup_docs.simhash_duckdb_sql())
def dedup_simhash(spark, sf_dir):
    """60-bit simhash, md5-derived token hashes — bit-identical DuckDB twin.
    The vectorized pandas-UDF variant (impl='pandas') is proven equal in
    tests/test_doc_ops.py."""
    d = _t(spark, sf_dir, "documents")
    return dedup_docs.simhash(d)


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_COSINE_SQL = """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(
             list_sum(list_transform(range(1, len(embedding) + 1),
                      i -> embedding[i]::DOUBLE * qv[i]::DOUBLE))
             / (SQRT(list_sum(list_transform(range(1, len(embedding) + 1),
                        i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))
                * SQRT(list_sum(list_transform(range(1, len(qv) + 1),
                        i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))),
             5) AS cosine
    FROM embeddings, q
    {where}
    ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""


@q("sim_topk_cosine", "§sim-brute,F8", _COSINE_SQL.format(where=""))
def sim_topk_cosine(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings", wide=True)
    qv = e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    return similarity.cosine_topk(e, list(qv), k=10)


@q("sim_ivf_topk", "§sim-ivf,S4", similarity.ivf_duckdb_sql(k=8, iters=2))
def sim_ivf_topk(spark, sf_dir):
    """Real IVF: deterministic k-means coarse quantizer (init = vec_id < 8,
    2 Lloyd steps, 6dp rounding) -> scan only the query's cell. The DuckDB
    twin re-trains the identical k-means and reproduces the assignment."""
    e = _t(spark, sf_dir, "embeddings", wide=True)
    return similarity.ivf_topk(e, k=10, n_cells=8, iters=2, query_id=0)


@q("sim_ivf_multiprobe", "§sim-ivf,S4",
   similarity.ivf_duckdb_sql(k=8, iters=2, probes=4))
def sim_ivf_multiprobe(spark, sf_dir):
    """IVF multi-probe (VERDICT r4 item 4): same deterministic coarse
    quantizer, but scan the 4 cells nearest the query (rounded squared-L2
    centroid ranking, ties -> lowest cid) instead of 1 — recovers
    neighbors that fell across a cell boundary at ~4/8 of the table scan
    (the full 4x-single-cell probe budget), still partition-prunable on
    the cell column. The DuckDB twin ranks the identical final centroids
    and probes the identical cells."""
    e = _t(spark, sf_dir, "embeddings", wide=True)
    return similarity.ivf_topk(e, k=10, n_cells=8, iters=2, query_id=0,
                               probes=4)


@q("sim_ivf_indexed", "§sim-ivf,S4",
   similarity.ivf_duckdb_sql(k=8, iters=2, probes=4))
def sim_ivf_indexed(spark, sf_dir):
    """IVF as a real index (the steady-state shape): the cell assignment
    is persisted ONCE (written partitioned by ``cell``, centroids stored
    alongside), so the query ranks cells driver-side against the stored
    centroids and reads only the probed ``cell=`` partitions — no
    per-query full-table assignment (which costs n_cells x dim math per
    row, 16x a brute scan's arithmetic; measured 54 s vs 3.1 s brute at
    2M x 128). Same training parameters as ``sim_ivf_multiprobe``, so the
    same DuckDB twin oracles both: identical centroids, cells, results."""
    import os as _os

    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    repo_root = _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    idx = _os.path.join(repo_root, ".data", "ivf_index",
                        f"{_os.path.basename(sf_dir.rstrip('/'))}_c8")
    if not _os.path.exists(_os.path.join(idx, "_ivf_centroids.json")):
        similarity.build_ivf_index(e, idx, n_cells=8, iters=2)
    return similarity.ivf_indexed_topk(spark, idx, list(qv), k=10, probes=4)


@q("sim_lsh_bucket_topk", "§sim-lsh,J2,F10", similarity.lsh_duckdb_sql(planes=6))
def sim_lsh_bucket_topk(spark, sf_dir):
    """Random-hyperplane LSH via one Arrow-batch matmul against the
    broadcast md5-derived ±1 matrix (constant plan size at any dim)."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    return similarity.lsh_bucket_topk(e, list(qv), dim=len(qv), k=10, planes=6)


@q("sim_lsh_multiprobe_topk", "§sim-lsh,S4,J2",
   similarity.lsh_multiprobe_duckdb_sql(planes=8, hamming=2))
def sim_lsh_multiprobe_topk(spark, sf_dir):
    """LSH as a real index: the ``_hbucket`` signature is persisted at
    ingest (written once, partitioned by bucket), so the query phase is
    partition-pruned parquet reads over the static Hamming<=2 probe ring
    (37/256 partitions) + exact JVM cosine — no Python UDF, no full scan.
    The DuckDB twin enumerates the same probe masks via xor()."""
    import os as _os

    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    repo_root = _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    idx = _os.path.join(repo_root, ".data", "lsh_index",
                        f"{_os.path.basename(sf_dir.rstrip('/'))}_p8")
    if not _os.path.exists(_os.path.join(idx, "_SUCCESS")):
        similarity.build_lsh_index(e, dim=len(qv), out_dir=idx, planes=8)
    return similarity.lsh_indexed_topk(
        spark, idx, list(qv), k=10, planes=8, hamming=2)


@q("sim_lsh_margin_topk", "§sim-lsh,S4,J2",
   similarity.lsh_multiprobe_duckdb_sql(planes=8, hamming=2, budget=16))
def sim_lsh_margin_topk(spark, sf_dir):
    """Margin-ranked multi-probe over the same persisted index: rank the
    static Hamming<=2 ring's masks by the summed |projection| margins of
    the planes they flip (flip least-confident planes first, Lv et al.
    VLDB'07) and probe only the cheapest 16 of 37 — ~0.43x the full-ring
    scan at nearly its recall, because low-margin flips carry almost all
    the neighbor probability mass. Probe choice is deterministic (6dp
    margin rounding, mask-id tie-break) so the DuckDB twin enumerates the
    identical probe set from the same query vector."""
    import os as _os

    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    repo_root = _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    idx = _os.path.join(repo_root, ".data", "lsh_index",
                        f"{_os.path.basename(sf_dir.rstrip('/'))}_p8")
    if not _os.path.exists(_os.path.join(idx, "_SUCCESS")):
        similarity.build_lsh_index(e, dim=len(qv), out_dir=idx, planes=8)
    return similarity.lsh_indexed_topk(
        spark, idx, list(qv), k=10, planes=8, hamming=2, budget=16)


# ---------------------------------------------------------------------------
# Text analysis over documents
# ---------------------------------------------------------------------------

@q(
    "text_langid",
    "F3,P8",
    f"""
    SELECT doc_id,
           CASE
             WHEN LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                  t -> t IN ({", ".join(f"'{w}'" for w in text.STOPWORDS)})))
                  / CAST(GREATEST(LEN(STRING_SPLIT(text, ' ')), 1) AS DOUBLE) >= 0.08
               THEN 'en_like'
             WHEN LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                  t -> t IN ({", ".join(f"'{w}'" for w in text.STOPWORDS)})))
                  / CAST(GREATEST(LEN(STRING_SPLIT(text, ' ')), 1) AS DOUBLE) >= 0.02
               THEN 'mixed'
             ELSE 'other'
           END AS pred_lang
    FROM documents
    """,
)
def text_langid(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text.langid_expr("text").alias("pred_lang"))


@q(
    "text_quality",
    "P13,P14,F14",
    f"""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           ROUND(LENGTH(text) /
                 CAST(GREATEST(LEN(STRING_SPLIT(text, ' ')), 1) AS DOUBLE), 6)
               AS avg_token_len,
           ROUND(LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) /
                 CAST(GREATEST(LENGTH(text), 1) AS DOUBLE), 6) AS digit_ratio,
           ROUND(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                 t -> t IN ({", ".join(f"'{w}'" for w in text.STOPWORDS)}))) /
                 CAST(GREATEST(LEN(STRING_SPLIT(text, ' ')), 1) AS DOUBLE), 6)
               AS stopword_ratio,
           ROUND(LEAST(LEN(STRING_SPLIT(text, ' ')) / 64.0, 1.0) *
                 (1.0 - ROUND(LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) /
                        CAST(GREATEST(LENGTH(text), 1) AS DOUBLE), 6)), 6)
               AS quality_score
    FROM documents
    """,
)
def text_quality(spark, sf_dir):
    return text.quality_metrics(_t(spark, sf_dir, "documents"))


@q(
    "text_token_stats",
    "A1,P5",
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_tokens,
           ROUND(AVG(LEN(STRING_SPLIT(text, ' '))), 6) AS avg_tokens
    FROM documents GROUP BY lang
    """,
)
def text_token_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    return d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(n_tok).cast("bigint").alias("total_tokens"),
        F.round(F.avg(n_tok), 6).alias("avg_tokens"),
    )


@q(
    "text_fingerprint",
    "F1,F2",
    """
    SELECT doc_id,
           SUBSTRING(sha256(
             REGEXP_REPLACE(
               REGEXP_REPLACE(
                 REGEXP_REPLACE(text, '\\r\\n|\\r', chr(10), 'g'),
                 '[ \\t]+' || chr(10), chr(10), 'g'),
               '[ \\t]+$', '', 'g')
           ), 1, 16) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text.fingerprint_expr("text").alias("fingerprint"))


# ---------------------------------------------------------------------------
# Round-3 training-pipeline fills: PII scrub, benchmark decontamination,
# deterministic split, stratified sampling
# ---------------------------------------------------------------------------

# DuckDB standard string literals do NOT process backslash escapes, so the
# single-backslash patterns pass through unmodified (doubling them — the r3
# bug — made the regex match a literal backslash and therefore nothing).
_PII_SQL_REDACT = "text"
_PII_SQL_HITS = []
for _tag, _pat in text.PII_PATTERNS:
    _PII_SQL_HITS.append(f"len(regexp_extract_all(text, '{_pat}'))")
    _PII_SQL_REDACT = (f"regexp_replace({_PII_SQL_REDACT}, '{_pat}', "
                       f"'[{_tag.upper()}]', 'g')")

# Planted PII rows (negative doc_ids) unioned into BOTH sides so the oracle
# hash comparison is non-vacuous: the synthetic sf corpus contains zero
# PII-shaped text, so without these the twin would agree on all-zeros.
_PII_PLANTED = [
    (-1, "contact alice.smith+x@example.org or bob@test.io today"),
    (-2, "hosts 10.0.0.1 and 192.168.1.254 pinged 255.255.255.0"),
    (-3, "leaked deadbeefdeadbeefdeadbeefdeadbeef0123 in the log"),
    (-4, "near misses: a@bXio and 1a2b3c4 must count zero"),
]
_PII_PLANTED_SQL = ", ".join(
    f"({i}, '{t}')" for i, t in _PII_PLANTED)


@q(
    "text_pii_redact",
    "§llm-pii,F1,P8",
    f"""
    SELECT doc_id,
           CAST({' + '.join(_PII_SQL_HITS)} AS BIGINT) AS n_redactions,
           lower(sha256({_PII_SQL_REDACT})) AS redacted_sha
    FROM (SELECT doc_id, text FROM documents
          UNION ALL
          SELECT * FROM (VALUES {_PII_PLANTED_SQL}) v(doc_id, text))
    """,
)
def text_pii_redact(spark, sf_dir):
    """PII scrub (emails / IPv4 / API-key-shaped hex) with per-doc hit
    count and scrubbed-text sha. Hit counts read the ORIGINAL text per
    pattern; replacements apply in declaration order — the DuckDB twin
    mirrors both. Planted-PII rows (negative ids) keep the twin comparison
    non-vacuous; behavior also unit-tested in tests/test_doc_ops."""
    planted = spark.createDataFrame(_PII_PLANTED, "doc_id bigint, text string")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.pii_redact(docs.unionByName(planted))


@q(
    "decontam_overlap",
    "§llm-decontam,J3,A5",
    """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS tok FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(tok) - 1),
                    i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]))
               AS shingle
      FROM tok WHERE len(tok) >= 3
    ), bench AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
    ), corpus AS (
      SELECT * FROM sh WHERE doc_id % 97 <> 0
    ), tot AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM corpus GROUP BY doc_id
    ), hit AS (
      SELECT doc_id, COUNT(*) AS n_overlap FROM corpus
      WHERE shingle IN (SELECT shingle FROM bench) GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_sh,
           COALESCE(h.n_overlap, 0) AS n_overlap,
           ROUND(COALESCE(h.n_overlap, 0) / t.n_sh::DOUBLE, 6) AS overlap_frac
    FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
    WHERE ROUND(COALESCE(h.n_overlap, 0) / t.n_sh::DOUBLE, 6) >= 0.05
    """,
)
def decontam_overlap(spark, sf_dir):
    """Benchmark decontamination: corpus docs sharing >= 5% of their
    3-gram shingles with the benchmark set (doc_id % 97 == 0 stand-in).
    Benchmark shingles broadcast (eval sets are small); corpus side is one
    explode + two partial aggs — no all-pairs."""
    return dedup_docs.decontam_overlap(_t(spark, sf_dir, "documents", wide=True),
                                       n=3, threshold=0.05, bench_mod=97)


@q(
    "split_train_test",
    "§llm-split,F2,A5",
    """
    SELECT lang,
           CASE WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
                     % 10 = 0
                THEN 'test' ELSE 'train' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY lang, split
    """,
)
def split_train_test(spark, sf_dir):
    """Deterministic hash split: md5(doc_id) % 10 -> 10% test. Portable
    (md5, not xxhash) so any engine reproduces the exact membership —
    train/test contamination is an md5 recomputation away from detectable."""
    d = _t(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("bigint")
    return (
        d.withColumn(
            "split",
            F.when(h % 10 == 0, F.lit("test")).otherwise(F.lit("train")),
        )
        .groupBy("lang", "split")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


@q(
    "sample_stratified",
    "§llm-sample,W2",
    """
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn <= 3
    """,
)
def sample_stratified(spark, sf_dir):
    """Stratified deterministic downsample: first 3 docs per (lang,
    source) stratum by doc_id — the reproducible per-domain sampling a
    corpus-mixing pipeline needs (row_number window, one shuffle)."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "lang", "source")
    )


# ---------------------------------------------------------------------------
# Round-2 coverage fills: grouping-set rollup (A1), duration parse (F6),
# arrays_overlap intersect (§2.7), multimodal decode (S17)
# ---------------------------------------------------------------------------

@q(
    "a1b_grouping_rollup",
    "A1 (multi-level rollup)",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           ROUND(SUM(l_extendedprice), 4) AS revenue,
           CAST(COUNT(*) AS BIGINT)       AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def a1b_grouping_rollup(spark, sf_dir):
    """Two-level ROLLUP with subtotals and a grand total — the reference's
    nested per-area/per-activity statistics plus overall totals
    (/root/reference/src/statistics/SkiAreaStatistics.ts:42-215). rollup()
    plans as a single Expand+HashAggregate: one shuffle for every level,
    no per-level re-scan — the 100 TB-safe way to get subtotal cubes."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
            F.count("*").cast("bigint").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "revenue",
            "n",
        )
    )


@q(
    "f6_duration_parse",
    "F6",
    """
    WITH durs AS (
      SELECT o_orderpriority,
             CAST(o_orderkey % 8 AS VARCHAR) || 'h '
               || CAST(o_orderkey % 60 AS VARCHAR) || 'min' AS dur
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(SUM(CAST(regexp_extract(dur, '(\\d+)h', 1) AS BIGINT) * 3600
                  + CAST(regexp_extract(dur, '(\\d+)min', 1) AS BIGINT) * 60)
                AS BIGINT) AS total_secs,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM durs
    GROUP BY o_orderpriority
    """,
)
def f6_duration_parse(spark, sf_dir):
    """Duration-string parse ('3h 25min' -> seconds), the reference's lift
    duration formatter run in reverse
    (/root/reference/src/transforms/LiftFormatter.ts:143-161). Pure JVM
    regexp — whole-stage codegen, no UDF."""
    o = _t(spark, sf_dir, "orders")
    dur = F.concat(
        (F.col("o_orderkey") % 8).cast("string"), F.lit("h "),
        (F.col("o_orderkey") % 60).cast("string"), F.lit("min"),
    )
    secs = (
        F.regexp_extract(dur, r"(\d+)h", 1).cast("bigint") * 3600
        + F.regexp_extract(dur, r"(\d+)min", 1).cast("bigint") * 60
    )
    return o.groupBy("o_orderpriority").agg(
        F.sum(secs).cast("bigint").alias("total_secs"),
        F.count("*").cast("bigint").alias("n"),
    )


@q(
    "set_intersect_overlap",
    "§2.7 intersect (arrays_overlap)",
    """
    SELECT lang,
           CAST(SUM(CASE WHEN list_has_any(string_split(text, ' '),
                                           ['the', 'and', 'of'])
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
           CAST(COUNT(*) AS BIGINT)                    AS n_docs
    FROM documents
    GROUP BY lang
    """,
)
def set_intersect_overlap(spark, sf_dir):
    """Set-intersection predicate via arrays_overlap — the reference's
    tag-array overlap filter
    (/root/reference/src/clustering/database/PostgreSQLClusteringDatabase.ts:509-517).
    arrays_overlap short-circuits JVM-side; no explode, no shuffle beyond
    the final agg."""
    d = _t(spark, sf_dir, "documents")
    hit = F.arrays_overlap(
        F.split("text", " "), F.array(F.lit("the"), F.lit("and"), F.lit("of"))
    )
    return d.groupBy("lang").agg(
        F.sum(hit.cast("bigint")).alias("n_overlap"),
        F.count("*").cast("bigint").alias("n_docs"),
    )


@q(
    "multimodal_decode",
    "S17 (binary decode: PPM image + WAV audio)",
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 4 END AS INTEGER)   AS width,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 4 END AS INTEGER)   AS height,
           CAST(CASE WHEN doc_id % 2 = 1 THEN 16000 END AS INTEGER)
                                                                  AS sample_rate,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 48 ELSE 12 END AS BIGINT)
                                                                  AS n_units,
           sha256(CASE WHEN doc_id % 2 = 0
                       THEN md5('m' || CAST(doc_id AS VARCHAR) || ':0')
                         || md5('m' || CAST(doc_id AS VARCHAR) || ':1')
                         || md5('m' || CAST(doc_id AS VARCHAR) || ':2')
                       ELSE substring(
                            md5('m' || CAST(doc_id AS VARCHAR) || ':0')
                         || md5('m' || CAST(doc_id AS VARCHAR) || ':1'),
                            1, 48) END)                           AS payload_sha
    FROM documents
    """,
)
def multimodal_decode(spark, sf_dir):
    """S17 made real: binary media payloads (PPM P6 images, RIFF/WAV PCM16
    audio) synthesized JVM-side from md5 chains, decoded by the pure-numpy
    kernels in an Arrow mapInPandas pass, and checksummed. The oracle
    recomputes the sha from the source hex — any header mis-parse or byte
    slip in the decoder breaks equality. Payload synthesis stays in
    whole-stage codegen (md5/unhex/concat); only the decode itself is
    Python, Arrow-batched. Reference precedent: satellite pixel extraction
    (/root/reference/snow-cover/src/pixel_extractor.py:43-84)."""
    from skipmap_processor_spark.operators.multimodal import (
        decode_features,
        encode_wav,
    )
    import numpy as np

    d = _t(spark, sf_dir, "documents", wide=True)
    seed = F.col("doc_id").cast("string")
    h = [F.md5(F.concat(F.lit("m"), seed, F.lit(f":{j}"))) for j in range(3)]
    ppm_header = F.lit("P6\n4 4\n255\n".encode())
    wav_header = F.lit(encode_wav(np.zeros(12, dtype=np.int16), 16000)[:44])
    payload = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(ppm_header, F.unhex(F.concat(*h))),
    ).otherwise(
        F.concat(wav_header,
                 F.unhex(F.substring(F.concat(h[0], h[1]), 1, 48))),
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image"))
        .otherwise(F.lit("audio")).alias("kind"),
        payload.alias("payload"),
    )
    return decode_features(media)


@q(
    "dedup_embedding_cosine",
    "§dedup-embedding (cosine near-dup, sign-block LSH prefilter)",
    """
    WITH base AS (
      SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(embedding, x -> x::DOUBLE * 1.01)
      FROM embeddings
    ),
    k AS (
      SELECT vec_id, v,
             (v[1] >= 0)::INT || (v[2] >= 0)::INT
               || (v[3] >= 0)::INT || (v[4] >= 0)::INT AS blk
      FROM base
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           ROUND(
             list_sum(list_transform(range(1, len(a.v) + 1),
                      i -> a.v[i] * b.v[i]))
             / (SQRT(list_sum(list_transform(range(1, len(a.v) + 1),
                        i -> a.v[i] * a.v[i])))
                * SQRT(list_sum(list_transform(range(1, len(b.v) + 1),
                        i -> b.v[i] * b.v[i])))),
             5) AS cosine
    FROM k a JOIN k b ON a.blk = b.blk AND a.vec_id < b.vec_id
    WHERE ROUND(
             list_sum(list_transform(range(1, len(a.v) + 1),
                      i -> a.v[i] * b.v[i]))
             / (SQRT(list_sum(list_transform(range(1, len(a.v) + 1),
                        i -> a.v[i] * a.v[i])))
                * SQRT(list_sum(list_transform(range(1, len(b.v) + 1),
                        i -> b.v[i] * b.v[i])))),
             5) >= 0.999
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup, the 5th dedup family member: candidates
    are blocked on a 4-bit axis-sign signature (an LSH prefilter both
    engines compute identically — near-identical vectors share it, and at
    scale more sign planes shrink blocks geometrically, keeping the
    self-join linear-ish instead of all-pairs), then verified with the
    exact cosine. The fixture has no natural near-dups (random 64-dim), so
    the query synthesizes them: a scaled copy of every vector (scaling
    preserves cosine exactly), making recall checkable — all 
    original/copy pairs must surface. Reference dedup precedent:
    in-batch keep-last + fuzzy clustering joins
    (/root/reference/src/clustering/database/PostgreSQLClusteringDatabase.ts:509-517)."""
    e = _t(spark, sf_dir, "embeddings", wide=True)
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    base = e.select(F.col("vec_id"), as_double.alias("v")).unionAll(
        e.select(
            (F.col("vec_id") + 1000000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x.cast("double") * F.lit(1.01)
            ).alias("v"),
        )
    )
    blk = F.concat(
        *[
            (F.element_at("v", i) >= 0).cast("int").cast("string")
            for i in (1, 2, 3, 4)
        ]
    )
    # norms are per-ROW quantities: computing them before the join does
    # |base| folds instead of 2x|pairs| folds (pairs >> rows under any
    # useful block size); only the dot product remains per-pair
    nrm = F.sqrt(
        F.aggregate(
            F.transform("v", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    k = base.withColumn("blk", blk).withColumn("nrm", nrm)

    # Lossless band prefilter on top of the 4-bit sign block: the 16-block
    # self-join alone is ~N^2/32 candidate pairs, each paying a 64-element
    # fold (the r5 scale-killer: 283 s at sf1.0). A qualifying pair needs
    # round(cos, 5) >= 0.999, i.e. cos >= 0.998995, so the normalized
    # vectors satisfy ||ua - ub|| = sqrt(2 - 2*cos) <= 0.04483 and by
    # Cauchy-Schwarz |ua_i - ub_i| <= 0.04483 < W on EVERY coordinate.
    # Bucketing floor(u_i / W) on a few coordinates and probing the +-1
    # neighbor buckets therefore keeps every pair the blk join would have
    # passed to the cosine filter; non-qualifying candidates are re-checked
    # by the exact cosine below, so the result set is unchanged (guide
    # S2.3 "shuffle fewer bytes" / S3.2 prefilter-before-join). Coords
    # 5..8 are used so the filter is independent of blk's sign bits 1..4
    # (fixture vectors are uniform 64-dim); coalesce keeps a NULL
    # element_at from poisoning the join key.
    W = 0.045
    band = [5, 6, 7, 8]
    bkt = [
        F.floor(
            F.coalesce(F.element_at("v", i), F.lit(0.0))
            / (F.col("nrm") * F.lit(W))
        ).alias(f"_k{j}")
        for j, i in enumerate(band)
    ]
    from itertools import product as _product

    offs = F.array(*[
        F.array(*[F.lit(int(o)) for o in combo])
        for combo in _product((-1, 0, 1), repeat=len(band))
    ])
    key_cols = ["blk"] + [f"_k{j}" for j in range(len(band))]
    a = (
        k.select(F.col("vec_id").alias("a_id"), "blk", *bkt)
        .withColumn("_off", F.explode(offs))
        .select(
            "a_id", "blk",
            *[(F.col(f"_k{j}") + F.col("_off")[j]).alias(f"_k{j}")
              for j in range(len(band))],
        )
    )
    b = k.select(F.col("vec_id").alias("b_id"), "blk", *bkt)
    pair_ids = (
        a.join(b, key_cols)
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
    )
    # the heavy vector payload is attached to the surviving pairs via two
    # broadcast joins (guide S8: decide with small rows, move big rows
    # once) — the multiprobe shuffle above carries only ids and bucket ints
    pairs = pair_ids.join(
        F.broadcast(
            k.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va"),
                     F.col("nrm").alias("na"))
        ),
        "a_id",
    ).join(
        F.broadcast(
            k.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb"),
                     F.col("nrm").alias("nb"))
        ),
        "b_id",
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(dot / (F.col("na") * F.col("nb")), 5)
    return pairs.select(
        "a_id", "b_id", cos.alias("cosine")
    ).filter(F.col("cosine") >= 0.999)


# ---------------------------------------------------------------------------
# Geometry slice (SURVEY §2: F9, W4, A8) — previously scoped out; now
# implemented pure-math / set-based (operators/geo.py). Each query derives a
# deterministic synthetic geometry table from `events` with integer-exact
# arithmetic so the DuckDB twin computes byte-identical inputs.
# ---------------------------------------------------------------------------

_GEO_HAV = """2*6371.0088*ASIN(SQRT(
      SIN((RADIANS(lat2)-RADIANS(lat))/2.0)*SIN((RADIANS(lat2)-RADIANS(lat))/2.0)
      + COS(RADIANS(lat))*COS(RADIANS(lat2))
        *SIN((RADIANS(lon2)-RADIANS(lon))/2.0)*SIN((RADIANS(lon2)-RADIANS(lon))/2.0)))"""


@q(
    "f9_points_along_line",
    "F9,P5,W2",
    f"""
    WITH pts0 AS (
      SELECT event_id % 40 AS line_id, event_id AS idx,
             (event_id % 360) - 180 + (event_id % 7) / 10.0   AS lon,
             ((event_id * 3) % 150) - 75 + (event_id % 11) / 10.0 AS lat,
             ROW_NUMBER() OVER (PARTITION BY event_id % 40
                                ORDER BY event_id) AS rn
      FROM events
    ),
    pts AS (SELECT * FROM pts0 WHERE rn <= 12),
    segs0 AS (
      SELECT line_id, idx, lon, lat,
             LEAD(lon) OVER w AS lon2, LEAD(lat) OVER w AS lat2
      FROM pts WINDOW w AS (PARTITION BY line_id ORDER BY idx)
    ),
    segs1 AS (
      SELECT *, {_GEO_HAV} AS seg_len
      FROM segs0
      WHERE lon2 IS NOT NULL AND (lon <> lon2 OR lat <> lat2)
    ),
    segs2 AS (
      SELECT *,
             COALESCE(SUM(seg_len) OVER (PARTITION BY line_id ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
               AS cum_start
      FROM segs1
    ),
    segs3 AS (
      SELECT *,
             GREATEST(CAST(1 AS BIGINT),
                      CAST(CEIL(cum_start/750.0) AS BIGINT))         AS k_lo,
             CAST(CEIL((cum_start+seg_len)/750.0) AS BIGINT) - 1     AS k_hi
      FROM segs2
    ),
    interior0 AS (
      SELECT line_id, lon, lat, lon2, lat2, cum_start, seg_len,
             UNNEST(generate_series(k_lo, k_hi)) AS k
      FROM segs3 WHERE k_hi >= k_lo
    ),
    interior AS (
      SELECT line_id,
             lon + ((k*750.0 - cum_start)/seg_len) * (lon2-lon) AS plon,
             lat + ((k*750.0 - cum_start)/seg_len) * (lat2-lat) AS plat
      FROM interior0
    ),
    ends AS (
      SELECT line_id, lon AS plon, lat AS plat FROM (
        SELECT line_id, lon, lat,
               ROW_NUMBER() OVER (PARTITION BY line_id ORDER BY idx)      AS rf,
               ROW_NUMBER() OVER (PARTITION BY line_id ORDER BY idx DESC) AS rl
        FROM pts) t
      WHERE rf = 1 OR rl = 1
    )
    SELECT DISTINCT line_id, ROUND(plon, 6) AS lon, ROUND(plat, 6) AS lat
    FROM (SELECT * FROM ends UNION ALL SELECT * FROM interior) u
    """,
)
def f9_points_along_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 (GeoTransforms.ts:137-202): points every 750 km along synthetic
    linestrings derived from events; see operators/geo.points_along_line."""
    from skipmap_processor_spark.operators import geo

    e = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    pts = e.select(
        (eid % 40).alias("line_id"),
        eid.alias("idx"),
        ((eid % 360) - 180 + (eid % 7) / F.lit(10.0)).alias("lon"),
        (((eid * 3) % 150) - 75 + (eid % 11) / F.lit(10.0)).alias("lat"),
    ).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("line_id").orderBy("idx")),
    ).filter(F.col("rn") <= 12).drop("rn")
    return geo.points_along_line(pts, interval_km=750.0)


@q(
    "w4_arc_merge",
    "W4,A2,A3",
    """
    WITH runs AS (
      SELECT event_id % 300 AS arc_id,
             ((event_id // 300) % 2) = 1 AS is_reversed,
             CASE WHEN event_id % 5 = 0 THEN TRUE
                  WHEN event_id % 5 = 1 THEN FALSE
                  ELSE NULL END AS oneway,
             'run-' || CAST(event_id % 13 AS VARCHAR) AS name,
             value
      FROM events
    )
    SELECT arc_id,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CASE WHEN SUM(CASE WHEN oneway = FALSE THEN 1 ELSE 0 END) > 0
                  OR (SUM(CASE WHEN oneway AND NOT is_reversed
                               THEN 1 ELSE 0 END) > 0
                      AND SUM(CASE WHEN oneway AND is_reversed
                                   THEN 1 ELSE 0 END) > 0)
                THEN 'false'
                WHEN SUM(CASE WHEN oneway THEN 1 ELSE 0 END) > 0 THEN 'true'
                ELSE 'unknown' END AS oneway_merged,
           STRING_AGG(DISTINCT name, ', ' ORDER BY name) AS names,
           ROUND(MAX(value), 4) AS max_value
    FROM runs GROUP BY arc_id
    """,
)
def w4_arc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 (MergeOverlappingRuns.ts:25-164): per-arc property merge with the
    order-independent oneway reduce; see operators/geo.merge_overlapping_arcs."""
    from skipmap_processor_spark.operators import geo

    e = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    runs = e.select(
        (eid % 300).alias("arc_id"),
        ((F.expr("event_id div 300") % 2) == 1).alias("is_reversed"),
        F.when(eid % 5 == 0, F.lit(True))
        .when(eid % 5 == 1, F.lit(False))
        .otherwise(F.lit(None).cast("boolean")).alias("oneway"),
        F.concat(F.lit("run-"), (eid % 13).cast("string")).alias("name"),
        "value",
    )
    merged = geo.merge_overlapping_arcs(runs)
    # nullable booleans canonicalize differently across engines (None vs
    # NaN); the registered surface stringifies the tri-state
    return merged.withColumn(
        "oneway_merged",
        F.coalesce(F.col("oneway_merged").cast("string"), F.lit("unknown")),
    )


@q(
    "a8_dissolve_boxes",
    "A8,J2,W5",
    """
    WITH RECURSIVE nc AS (
      SELECT GREATEST(CAST(1 AS BIGINT), COUNT(*) // 6) AS n
      FROM events WHERE event_id % 10 < 3
    ),
    boxes AS (
      SELECT event_id AS id,
             (event_id % n) % 1024 * 20 + event_id % 16            AS x1,
             (event_id % n) // 1024 * 20 + event_id % 13           AS y1,
             (event_id % n) % 1024 * 20 + event_id % 16
               + 2 + event_id % 5                                  AS x2,
             (event_id % n) // 1024 * 20 + event_id % 13
               + 2 + event_id % 7                                  AS y2
      FROM events, nc WHERE event_id % 10 < 3
    ),
    edges AS (
      SELECT a.id AS ia, b.id AS ib
      FROM boxes a JOIN boxes b
        ON a.x1 <= b.x2 AND b.x1 <= a.x2
       AND a.y1 <= b.y2 AND b.y1 <= a.y2 AND a.id <> b.id
    ),
    reach(id, root) AS (
      SELECT id, id FROM boxes
      UNION
      SELECT e.ib, r.root FROM reach r JOIN edges e ON e.ia = r.id
    ),
    comp AS (SELECT id, MIN(root) AS comp FROM reach GROUP BY id)
    SELECT c.comp AS comp, CAST(COUNT(*) AS BIGINT) AS n_boxes,
           MIN(b.x1) AS x1, MIN(b.y1) AS y1,
           MAX(b.x2) AS x2, MAX(b.y2) AS y2
    FROM boxes b JOIN comp c ON b.id = c.id
    GROUP BY c.comp
    """,
)
def a8_dissolve_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (PostgreSQLClusteringDatabase.ts:684-702): dissolve overlapping
    boxes into connected blobs — grid-bucketed overlap join + distributed
    connected components; see operators/geo.dissolve_boxes.

    The synthetic box field scales its cell grid with the row count so
    per-cell density (and so component size and candidate-pair fan-out)
    stays CONSTANT as sf grows — cost linear in rows, the shape the
    operator must have at 100 TB."""
    from skipmap_processor_spark.operators import geo

    e = _t(spark, sf_dir, "events", wide=True).filter(F.col("event_id") % 10 < 3)
    n = max(1, e.count() // 6)  # deterministic: row count of the filter
    eid = F.col("event_id")
    cell = eid % n
    x1 = (cell % 1024) * 20 + eid % 16
    y1 = F.expr(f"(event_id % {n}) div 1024") * 20 + eid % 13
    boxes = e.select(
        eid.alias("id"),
        x1.alias("x1"),
        y1.alias("y1"),
        (x1 + 2 + eid % 5).alias("x2"),
        (y1 + 2 + eid % 7).alias("y2"),
    )
    return geo.dissolve_boxes(boxes, cell_size=20)


@q(
    "s14_mvt_point_tiles",
    "S14,P1,A7",
    """
    WITH pts AS (
      SELECT ((event_id % 320) - 160 + (event_id % 7) / 10.0) AS lon,
             ((event_id % 140) - 70 + (event_id % 11) / 10.0) AS lat
      FROM events WHERE event_id % 5 = 0
    ),
    tiled AS (
      SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 64.0) AS INT)       AS x,
             CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat))
                  + 1.0/COS(RADIANS(lat))) / PI()) / 2.0 * 64.0)
                  AS INT)                                            AS y
      FROM pts WHERE lat > -85.05112878 AND lat < 85.05112878
    )
    SELECT 6 AS z, x, y, CAST(COUNT(*) AS BIGINT) AS n_features
    FROM tiled GROUP BY x, y
    """,
)
def s14_mvt_point_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14 (TilesGenerator.ts:8-60): the MVT sink's tile assignment +
    per-tile grouping under the oracle gate — (z,x,y,n_features) from the
    REAL sink path (sinks/mvt.write_point_tiles, applyInPandas encode);
    tile bytes themselves are covered by the round-trip decoder tests."""
    from skipmap_processor_spark.sinks import mvt

    e = _t(spark, sf_dir, "events", wide=True).filter(F.col("event_id") % 5 == 0)
    eid = F.col("event_id")
    pts = e.select(
        ((eid % 320) - 160 + (eid % 7) / F.lit(10.0)).alias("lon"),
        ((eid % 140) - 70 + (eid % 11) / F.lit(10.0)).alias("lat"),
    )
    return mvt.write_point_tiles(pts, zoom=6).select(
        "z", "x", "y", "n_features")


@q(
    "s15_pnts_tiles",
    "S15,P1,A7",
    """
    WITH pts AS (
      SELECT ((event_id % 320) - 160 + (event_id % 7) / 10.0) AS lon,
             ((event_id % 140) - 70 + (event_id % 11) / 10.0) AS lat,
             (event_id % 900) / 1.0 AS elev
      FROM events
    )
    SELECT CAST(FLOOR(lon / 5.0) AS INT) AS tx,
           CAST(FLOOR(lat / 5.0) AS INT) AS ty,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(MIN(lon), 6) AS min_lon, ROUND(MIN(lat), 6) AS min_lat,
           ROUND(MAX(lon), 6) AS max_lon, ROUND(MAX(lat), 6) AS max_lat
    FROM pts GROUP BY tx, ty
    """,
)
def s15_pnts_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15 (Tiles3DGenerator.ts:84): the 3D-tiles sink's cell assignment,
    counts and bounding volumes under the oracle gate — from the REAL
    sink path (sinks/tiles3d.write_pnts_tiles); .pnts bytes covered by
    the round-trip tests."""
    from skipmap_processor_spark.sinks import tiles3d

    e = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    pts = e.select(
        ((eid % 320) - 160 + (eid % 7) / F.lit(10.0)).alias("lon"),
        ((eid % 140) - 70 + (eid % 11) / F.lit(10.0)).alias("lat"),
        ((eid % 900) / F.lit(1.0)).alias("elev"),
    )
    t = tiles3d.write_pnts_tiles(pts, cell_deg=5.0, elev_col="elev")
    return t.select(
        "tx", "ty", "n_points",
        F.round("min_lon", 6).alias("min_lon"),
        F.round("min_lat", 6).alias("min_lat"),
        F.round("max_lon", 6).alias("max_lon"),
        F.round("max_lat", 6).alias("max_lat"),
    )


@q(
    "cdc_envelope_roundtrip",
    "S1,I14,F15",
    """
    WITH m AS (
        SELECT
            CASE abs(event_id) % 10 WHEN 0 THEN 'delete' WHEN 1 THEN 'rename'
                 WHEN 2 THEN 'insert' ELSE 'update' END          AS op,
            'r' || CAST(user_id % 40 AS VARCHAR)                 AS repo,
            md5(CAST(event_id AS VARCHAR))                       AS commit_id,
            CASE WHEN abs(event_id) % 10 = 1
                 THEN 'src/g' || CAST(event_id % 499 AS VARCHAR) || '.py'
            END                                                  AS new_path,
            CASE WHEN abs(event_id) % 10 IN (0, 1) THEN NULL
                 ELSE props END                                  AS content,
            CASE WHEN abs(event_id) % 10 IN (0, 1) THEN NULL
                 ELSE json_extract_string(props, '$.k') END      AS k,
            event_id * 1000 + 123                                AS ts_ms
        FROM events)
    SELECT op,
           CAST(COUNT(*) AS BIGINT)                AS n,
           CAST(COUNT(DISTINCT repo) AS BIGINT)    AS n_repos,
           CAST(SUM(LENGTH(content)) AS BIGINT)    AS content_len,
           CAST(SUM(LENGTH(new_path)) AS BIGINT)   AS new_path_len,
           MAX(commit_id)                          AS max_commit,
           CAST(SUM(CAST(k AS BIGINT)) AS BIGINT)  AS sum_k,
           CAST(MAX(ts_ms) AS BIGINT)              AS max_ts_ms
    FROM m GROUP BY op
    """,
)
def cdc_envelope_roundtrip(spark, sf_dir):
    """Debezium wire-envelope adapter under the oracle gate (SURVEY §2.1 S1
    ingestion surface): map the driver's events table onto internal CDC
    events, serialize every row to a Debezium JSON document
    (sources/envelopes.to_debezium), parse the documents back
    (parse_debezium), and aggregate the PARSED rows. The DuckDB twin
    computes the same aggregate from the direct mapping — equality proves
    the envelope roundtrip is lossless (ops incl. key-change renames,
    null images, extra-col maps, ms timestamps) on a dataset independent
    of the pytest fixtures. Pure JVM to_json/from_json: one map-only pass
    plus the aggregate's single exchange; no UDFs.

    Reference parity: the reference's Postgres row adapters + ON CONFLICT
    upsert feed (/root/reference/src/io/PostGISDataStore.ts:829-850) —
    this is the standard-wire-format leg of that surface.
    """
    from skipmap_processor_spark.sources.envelopes import (
        parse_debezium,
        to_debezium,
    )

    ev = _t(spark, sf_dir, "events", wide=True)
    eid = F.col("event_id")
    m = F.abs(eid) % 10
    is_del, is_ren, is_ins = m == 0, m == 1, m == 2
    is_data = ~((m == 0) | (m == 1))
    internal = ev.select(
        (eid % 5).cast("long").alias("epoch"),
        eid.alias("event_seq"),
        F.md5(eid.cast("string")).alias("commit"),
        # epoch-millis-derived ts: tz-independent on both engines (the
        # driver table's ts is TIMESTAMP_NTZ; unix_millis needs LTZ and a
        # session-tz-dependent cast would couple the hash to the runner)
        F.timestamp_millis(eid * 1000 + F.lit(123)).alias("ts"),
        F.when(is_del, F.lit("delete"))
        .when(is_ren, F.lit("rename"))
        .when(is_ins, F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.concat(F.lit("r"), (F.col("user_id") % 40).cast("string")).alias("repo"),
        F.concat(F.lit("src/f"), (eid % 499).cast("string"), F.lit(".py")).alias(
            "path"
        ),
        F.when(
            is_ren,
            F.concat(F.lit("src/g"), (eid % 499).cast("string"), F.lit(".py")),
        ).alias("new_path"),
        F.when(is_data, F.col("event_type")).alias("lang"),
        F.when(is_data, F.col("props")).alias("content"),
        F.lit(1).cast("int").alias("schema_ver"),
        F.when(
            is_data,
            F.create_map(F.lit("k"), F.get_json_object("props", "$.k")),
        ).alias("extra_cols"),
    )
    parsed = parse_debezium(to_debezium(internal))
    return parsed.groupBy("op").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("repo").cast("bigint").alias("n_repos"),
        F.sum(F.length("content")).cast("bigint").alias("content_len"),
        F.sum(F.length("new_path")).cast("bigint").alias("new_path_len"),
        F.max("commit").alias("max_commit"),
        F.sum(F.col("extra_cols")["k"].cast("bigint")).alias("sum_k"),
        F.max(F.unix_millis("ts")).cast("bigint").alias("max_ts_ms"),
    )
