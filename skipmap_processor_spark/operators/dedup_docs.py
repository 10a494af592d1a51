"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale design notes (the point of each op at 100 TB):
- exact: one shuffle on sha256(text) — hash-groupBy, partial agg map-side.
- n-gram Jaccard: shingle -> equi-join on shingle -> pair-count. The join is
  the bottleneck at scale; extremely frequent shingles are skew bombs, so
  ``max_shingle_freq`` drops stop-shingles before the self-join (standard
  suffix-array/MinHash practice).
- MinHash+LSH: shingles × K md5-derived hash families -> min per (doc, k) ->
  band signatures -> candidates = equi-join on (band, signature). Avoids the
  all-pairs join entirely; cost linear in corpus + candidate pairs.
- SimHash: vectorized pandas/Arrow UDF (numpy bit math over token hash
  arrays), one pass, then exact hamming-bucket grouping.

All hash families are md5-based so a DuckDB oracle computes bit-identical
values (Spark xxhash64/hash are not portable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# pair volume below which jaccard_pairs skips the packed-pair path (and
# its one-job id-bound check) — packing only pays at scale; tests patch
# this to 0 to pin packed == struct equivalence on small corpora
_PACK_EST_MIN = 5_000_000

# --- shared shingling --------------------------------------------------------


def shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id",
             text_col: str = "text", distinct: bool = True) -> DataFrame:
    """N-word shingles per doc: (doc_id, shingle), distinct by default.
    ``distinct=False`` skips the dedup shuffle for consumers whose fold
    is duplicate-insensitive (MIN in the minhash signatures)."""
    parts = ", ".join(f"element_at(tok, i + {j})" for j in range(n))
    out = (
        df.select(id_col, F.split(F.col(text_col), " ").alias("tok"))
        .filter(F.size("tok") >= n)  # sequence(1, 0) would descend
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(tok) - {n - 1}), "
                    f"i -> concat_ws(' ', {parts}))"
                )
            ).alias("shingle"),
        )
    )
    return out.distinct() if distinct else out


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by content hash (one shuffle, map-side partial)."""
    return (
        df.select(F.col(id_col), F.lower(F.sha2(F.col(text_col), 256)).alias("text_sha"))
        .groupBy("text_sha")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min(id_col).cast("bigint").alias("rep_doc_id"),
        )
    )


def jaccard_pairs(df: DataFrame, n: int = 3, threshold: float = 0.2,
                  max_shingle_freq: int = 100) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold via shared-shingle equi-join.

    ``max_shingle_freq`` drops shingles occurring in more than that many docs
    before the self-join (skew guard: a stop-shingle in 1M docs would create
    10^12 join rows).
    """
    from pyspark import StorageLevel

    # One shingle set, computed once and persisted (spills to disk at
    # scale); the stop-shingle frequency comes from a plain groupBy (hash
    # aggregate — cheaper than the r5 sort-based count window). The pair
    # enumeration is the dominant cost at scale (at sf1.0: 67M candidate
    # pairs, nearly all from shingles near the frequency cap), so it is
    # restructured from a string-keyed self-join into one per-shingle
    # doc-list aggregation (bounded by max_shingle_freq) followed by a
    # map-side emission of the a<b pairs from each sorted list: the only
    # big shuffle carries (int, int) pair rows into the count aggregate
    # (guide S2.3: shuffle keys, not payloads). Per-doc sizes re-attach
    # to the thresholded aggregate via a broadcast join.
    sh = shingles(df, n).persist(StorageLevel.MEMORY_AND_DISK)
    freq = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_k"))
        .filter(F.col("_k") <= max_shingle_freq)
    )
    # Candidate pairs are near-distinct, so the count aggregate's cost is
    # its per-task hash state: size the pair shuffle so each task holds a
    # bounded map (~300k keys) rather than the core count's default
    # (measured at sf1.0: 67M pairs over 32 partitions = 31 s of
    # hash-probe/spill, over 256 = 5 s — guide S5 "more partitions,
    # smaller per-task state"). The exact pair count comes free from the
    # capped vocabulary: sum k*(k-1)/2 over one tiny aggregate.
    est = (freq.agg(F.sum(F.expr("_k * (_k - 1) / 2")).alias("p"))
           .first()["p"]) or 0
    par = df.sparkSession.sparkContext.defaultParallelism
    n_pair_parts = int(min(4096, max(par, est // 300_000 + 1)))
    kept = freq.select("shingle")
    shf = sh.join(kept, "shingle", "left_semi")
    sizes = shf.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    doc_lists = shf.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds"))
    # Pair packing: when every doc id fits 31 bits, a candidate pair
    # travels as ONE non-negative bigint (a << 32 | b) instead of two —
    # half the shuffle bytes and a single-long hash key for the count
    # aggregate (the per-pair cost IS the aggregate's hash state at
    # scale). The id bound is checked exactly; wider ids keep the
    # two-column shape.
    packable = False
    if est >= _PACK_EST_MIN:
        # the id-bound check is one tiny aggregate — only worth paying
        # when the pair volume is large enough for packing to matter
        # (the exact `est` above decides, so the gate is scale-adaptive,
        # not a core-count tune)
        id_bound = df.agg(
            F.max(F.col("doc_id")).alias("mx"),
            F.min(F.col("doc_id")).alias("mn"),
            (F.count(F.lit(1)) - F.count("doc_id")).alias("nulls")).first()
        packable = (id_bound["mx"] is not None
                    and id_bound["nulls"] == 0  # a null id must not fold
                    and 0 <= id_bound["mn"]     # distinct null-pairs with
                    and id_bound["mx"] < (1 << 31))
    if packable:
        pairs = (
            doc_lists.select(F.explode(F.expr(
                # all i<j pairs of the sorted doc list, emitted map-side
                "flatten(transform(ds, (x, i) -> "
                "transform(slice(ds, i + 2, size(ds)), "
                "y -> x * 4294967296 + y)))"
            )).alias("pk"))
            # repartition on the group key BEFORE aggregating: candidate
            # pairs are near-distinct (67M rows -> 67M groups at sf1.0),
            # so the map-side partial aggregate reduces nothing and just
            # builds full-size hash maps ahead of the exchange;
            # hash-partitioning first collapses the plan to one aggregate
            # after the shuffle, sized by the exact pair estimate above
            .repartition(n_pair_parts, "pk")
            .groupBy("pk")
            .agg(F.count("*").alias("n_common"))
            .select(
                F.shiftright("pk", 32).alias("a_id"),
                (F.col("pk") % F.lit(1 << 32)).alias("b_id"),
                "n_common",
            )
        )
    else:
        pairs = (
            doc_lists.select(F.explode(F.expr(
                "flatten(transform(ds, (x, i) -> "
                "transform(slice(ds, i + 2, size(ds)), "
                "y -> named_struct('a_id', x, 'b_id', y))))"
            )).alias("p"))
            .select("p.a_id", "p.b_id")
            .repartition(n_pair_parts, "a_id", "b_id")
            .groupBy("a_id", "b_id")
            .agg(F.count("*").alias("n_common"))
        )
    out = (
        pairs
        .join(F.broadcast(sizes.select(F.col("doc_id").alias("a_id"),
                                       F.col("n_sh").alias("a_sh"))), "a_id")
        .join(F.broadcast(sizes.select(F.col("doc_id").alias("b_id"),
                                       F.col("n_sh").alias("b_sh"))), "b_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("a_sh") + F.col("b_sh") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
    # Materialize the (small, thresholded) pair set now, then release the
    # shingle cache immediately — a bare return would leak the persisted
    # set in executor storage for the life of the session (ADVICE r2).
    # localCheckpoint truncates the lineage so `out` no longer references
    # the cache.
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


def minhash_signatures(df: DataFrame, n: int = 3, num_hashes: int = 16) -> DataFrame:
    """(doc_id, hidx, minhash) — Kirsch-Mitzenmacher family over ONE md5.

    One md5 per shingle yields two independent 32-bit halves (h1, h2);
    family k is (h1 + k*h2) mod 2^32 — the standard two-hash construction,
    portable to the DuckDB twin in exact integer arithmetic (max value
    ~2^36, no BIGINT overflow on either engine). vs the old k-prefixed-md5
    family: 1/16th the md5 calls, and the min per family aggregates as 16
    COLUMNS per doc (map-side partial agg) instead of exploding 16 rows
    per shingle through the shuffle — 16x less shuffle volume. The
    (hidx, minhash) row shape unpivots AFTER aggregation, when it's one
    row per doc.

    The shingle set is deliberately NOT deduplicated first: MIN is
    insensitive to duplicate shingles within a doc, so skipping the
    distinct drops a full (doc_id, shingle) string shuffle and lets the
    min fold happen map-side in the scan stage (guide S2.3 aggregate-
    before-shuffle; result proven unchanged by the oracle twin, which
    folds over the distinct set)."""
    sh = shingles(df, n, distinct=False)
    hh = sh.select("doc_id", F.md5("shingle").alias("d")).select(
        "doc_id",
        F.expr("cast(conv(substring(d, 1, 8), 16, 10) as bigint)").alias("h1"),
        F.expr("cast(conv(substring(d, 9, 8), 16, 10) as bigint)").alias("h2"),
    )
    mins = hh.groupBy("doc_id").agg(
        *[
            F.min(F.expr(f"(h1 + {k} * h2) % 4294967296")).alias(f"m{k}")
            for k in range(num_hashes)
        ]
    )
    return mins.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("hidx"), F.col(f"m{k}").alias("minhash")
                    )
                    for k in range(num_hashes)
                ]
            )
        ).alias("h"),
    ).select("doc_id", F.col("h.hidx").alias("hidx"), F.col("h.minhash").alias("minhash"))


def minhash_lsh_candidates(
    df: DataFrame, n: int = 3, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """LSH candidate pairs: docs agreeing on all rows of >=1 band."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, n, num_hashes).withColumn(
        "band", (F.col("hidx") / F.lit(rows_per_band)).cast("int")
    )
    band_sig = sig.groupBy("doc_id", "band").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("hidx"), F.col("minhash")))
                ),
                lambda s: s["minhash"].cast("string"),
            ),
            ",",
        ).alias("sig")
    )
    a = band_sig.alias("a")
    b = band_sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")),
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )


# --- SimHash ------------------------------------------------------------------
#
# 60-bit simhash. Token hash = first 15 hex chars of md5(token) (60 bits keeps
# the value positive in a signed BIGINT on both engines, so the whole op has a
# bit-identical DuckDB twin). Bit b of the simhash is set iff at least half of
# the document's tokens have bit b set in their hash.

SIMHASH_BITS = 60

_TOKEN_HASH_SQL = (
    "transform(split({col}, ' '), "
    "t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
)

_SIMHASH_FOLD_SQL = (
    f"aggregate(sequence(0, {SIMHASH_BITS - 1}), cast(0 as bigint), "
    "(acc, b) -> acc + if("
    "2 * size(filter({hs}, h -> shiftright(h, b) % 2 = 1)) >= size({hs}), "
    "shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"
)


def simhash_expr(text_col: str):
    """Whole-stage-codegen simhash: md5 token hashes + HOF bit vote, all JVM."""
    hs = _TOKEN_HASH_SQL.format(col=text_col)
    return F.expr(_SIMHASH_FOLD_SQL.format(hs=hs))


def _simhash_vote_batch(hashes: pd.Series) -> pd.Series:
    """Vectorized bit-vote over per-doc token-hash arrays (F10 pandas-UDF
    path, proven equal to simhash_expr in tests/test_doc_ops.py).

    No per-row Python: the Arrow list column is flattened to (values,
    offsets) natively; per-bit sums use np.add.reduceat over the flat
    array — the only Python loop is over the 60 constant bit positions."""
    import pyarrow as pa

    arr = pa.array(hashes, type=pa.list_(pa.int64()))
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.uint64)
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    out = np.zeros(len(lens), dtype=np.int64)
    nonempty = lens > 0
    if flat.size:
        starts = np.minimum(offs[:-1], flat.size - 1)
        for b in range(SIMHASH_BITS):
            col = ((flat >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
            sums = np.add.reduceat(col, starts)
            bit = ((2 * sums >= lens) & nonempty).astype(np.int64)
            out |= bit << b
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text", impl: str = "expr") -> DataFrame:
    """(doc_id, simhash). ``impl='expr'`` = pure JVM expressions (default,
    oracle-matched); ``impl='pandas'`` = JVM md5 token hashes + Arrow numpy
    bit-vote (the vectorized-UDF surface, byte-identical output)."""
    if impl == "expr":
        return df.select("doc_id", simhash_expr(text_col).alias("simhash"))
    vote = F.pandas_udf(_simhash_vote_batch, LongType())
    hs = F.expr(_TOKEN_HASH_SQL.format(col=text_col))
    return df.select("doc_id", vote(hs).alias("simhash"))


def simhash_duckdb_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB twin of simhash_expr (bit-identical 60-bit values)."""
    return f"""
    WITH hs AS (
      SELECT {id_col},
             list_transform(string_split({text_col}, ' '),
                t -> CAST(('0x' || substring(md5(t), 1, 15))::UBIGINT AS BIGINT))
                 AS h
      FROM {table}
    )
    SELECT {id_col},
           CAST(list_sum(list_transform(range(0, {SIMHASH_BITS}),
             b -> CASE WHEN 2 * len(list_filter(h, x -> (x >> b) & 1 = 1))
                            >= len(h)
                       THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))
             AS BIGINT) AS simhash
    FROM hs
    """


def decontam_overlap(df: DataFrame, n: int = 5, threshold: float = 0.2,
                     bench_mod: int = 97) -> DataFrame:
    """Benchmark decontamination: per corpus doc, the fraction of its n-gram
    shingles that appear anywhere in the benchmark set (here: doc_id %
    bench_mod == 0 stands in for the held-out eval set). Docs at or above
    ``threshold`` are contamination suspects to drop before training.

    Scale shape: the benchmark shingle set is small (eval sets are) — the
    distinct-shingle lookup broadcasts; the corpus side is one explode +
    ONE aggregation (total and overlap counted in the same pass: the r5
    shape ran the corpus explode+distinct twice, once per aggregate, and
    paid a shuffled join to glue the halves — guide S2.4 remove shuffles
    outright). No all-pairs anything."""
    sh = shingles(df, n)
    is_bench = F.col("doc_id") % bench_mod == 0
    bench_sh = (sh.filter(is_bench).select("shingle").distinct()
                .withColumn("_hit", F.lit(1)))
    corpus_sh = sh.filter(~is_bench)
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sh"),
            F.count("_hit").alias("n_overlap"),
        )
        .select(
            "doc_id",
            "n_sh",
            "n_overlap",
            F.round(
                F.col("n_overlap") / F.col("n_sh").cast("double"), 6
            ).alias("overlap_frac"),
        )
        .filter(F.col("overlap_frac") >= threshold)
    )


def simhash_dup_buckets(df: DataFrame, prefix_bits: int = 16) -> DataFrame:
    """Near-dup buckets: docs sharing the top ``prefix_bits`` of simhash."""
    s = simhash(df)
    bucket = F.shiftrightunsigned(F.col("simhash"), SIMHASH_BITS - prefix_bits)
    return (
        s.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("rep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )
