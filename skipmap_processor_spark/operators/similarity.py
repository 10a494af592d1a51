"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. The
  dot product runs JVM-side via higher-order functions (zip_with +
  aggregate), no Python in the hot path; at scale this is one broadcast of
  the query vector + a map-side scan + TakeOrderedAndProject (no shuffle of
  the full table).
- ``ivf_topk``: IVF-style scale path — restrict the scan to the query's
  coarse partition (here the ``label`` column stands in for a centroid
  assignment; with real data you'd k-means to get it). Partition pruning
  turns a full-corpus scan into a 1/N_cells scan.
- ``lsh_bucket_topk``: random-hyperplane LSH variant; hyperplane signs are
  derived from md5 so buckets are deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), q), 5).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    query_cell,
    k: int = 10,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF scale path: scan only the query's coarse cell, then exact rank.

    With the cell as a partition column the filter becomes partition
    pruning — the 100 TB scan shrinks by the cell count.
    """
    return cosine_topk(
        df.filter(F.col(cell_col) == F.lit(query_cell)), query_vec, k, id_col, vec_col
    )


def lsh_bucket(vec_col: Column, dim: int, planes: int = 8) -> Column:
    """Deterministic random-hyperplane bucket id (md5-derived ±1 weights)."""
    bucket = F.lit(0)
    for p in range(planes):
        # weight_j = +1 if md5(p:j) has even first hex digit else -1
        terms = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(
                    *[
                        F.when(
                            F.expr(
                                f"conv(substring(md5('{p}:{j}'), 1, 1), 16, 10) % 2"
                            )
                            == 0,
                            F.lit(1.0),
                        ).otherwise(F.lit(-1.0))
                        for j in range(dim)
                    ]
                ),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(terms >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_bucket_topk(
    df: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: hash all vectors + the query into hyperplane-sign buckets, rank
    only the query's bucket. Recall < 1 by construction; used with
    multi-probe in practice."""
    import hashlib

    # compute the query's bucket driver-side with the same md5 weights
    qb = 0
    for p in range(planes):
        s = 0.0
        for j, x in enumerate(query_vec):
            w = 1.0 if int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0
            s += float(x) * w
        if s >= 0:
            qb |= 1 << p
    bucketed = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, planes))
    return cosine_topk(
        bucketed.filter(F.col("_bucket") == qb), query_vec, k, id_col, vec_col
    )
