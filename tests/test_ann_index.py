"""CDC-maintained IVF index: refresh == rebuild (exact, full-probe), moved
vectors never resurface from their old cell, cursor no-op/idempotency."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from skipmap_processor_spark.lake import LakeTable
from skipmap_processor_spark.operators import ann_index


def c(i: int) -> str:
    return f"{i:016x}" + "a" * 24


def _vec(seed: int, dim: int = 8) -> list[float]:
    # deterministic, well-spread unit-ish vectors
    return [float(((seed * 31 + j * 17) % 97) - 48) / 48.0
            for j in range(dim)]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, event_seq bigint, "
        "op string, embedding array<float>",
    )


def _build_table(spark, path, n=40):
    t = LakeTable.create(spark, path, num_buckets=4, merge_mode="mor",
                         payload_cols=[("embedding", "array<float>")])
    rows = [("r%d" % (i % 3), "f%03d" % i, c(1), i, "upsert", _vec(i))
            for i in range(n)]
    t.merge_batch(_mk(spark, rows), epoch=0)
    return t


def _brute(t, qv, k=5):
    df = t.read().filter(F.col("embedding").isNotNull())
    qdf = t.spark.createDataFrame([([float(x) for x in qv],)],
                                  "_qv array<double>")
    dot = ("aggregate(zip_with(embedding, _qv, (x, y) -> "
           "CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x)")
    nv = ("sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * "
          "CAST(x AS DOUBLE)), 0.0D, (acc, x) -> acc + x))")
    nq = ("sqrt(aggregate(transform(_qv, x -> x * x), 0.0D, "
          "(acc, x) -> acc + x))")
    return [tuple(r) for r in
            df.crossJoin(F.broadcast(qdf))
            .select("repo", "path",
                    F.expr(f"round({dot} / ({nv} * {nq}), 5)")
                    .alias("cosine"))
            .orderBy(F.col("cosine").desc(), "repo", "path").limit(k)
            .collect()]


def _topk(t, idx, qv, k=5, probes=None):
    meta = ann_index._load_meta(idx)
    p = probes if probes is not None else meta["n_cells"]
    return [tuple(r) for r in
            ann_index.lake_ivf_topk(t.spark, idx, qv, k=k,
                                    probes=p).collect()]


def test_refresh_matches_rebuild_exactly(spark, warehouse):
    t = _build_table(spark, os.path.join(warehouse, "t"))
    idx = os.path.join(warehouse, "idx")
    ann_index.build_lake_ivf_index(t, idx, n_cells=4, iters=2)

    # epoch 1: inserts + updates (some vectors MOVE cells) + deletes
    t.merge_batch(_mk(spark, [
        ("r9", "new%02d" % i, c(2), i, "upsert", _vec(100 + i))
        for i in range(6)
    ] + [
        ("r0", "f000", c(2), 90, "upsert", _vec(200)),   # moved vector
        ("r1", "f001", c(2), 91, "upsert", _vec(201)),
        ("r2", "f002", c(2), 92, "delete", None),
        ("r0", "f003", c(2), 93, "delete", None),
    ]), epoch=1)
    st = ann_index.refresh_lake_ivf_index(t, idx)
    assert st["fresh_rows"] == 8 and st["tomb_rows"] == 4

    # full-probe query == brute force over the live table, several vectors
    for seed in (0, 100, 200, 7):
        qv = _vec(seed)
        assert _topk(t, idx, qv) == _brute(t, qv), seed

    # deleted keys never appear even at full probes and large k
    got = {(r[0], r[1]) for r in _topk(t, idx, _vec(2), k=100)}
    assert ("r2", "f002") not in got and ("r0", "f003") not in got
    # each key appears at most once (old cell entry of a moved vector dead)
    assert len(got) == len(set(got)) and ("r0", "f000") in got


def test_refresh_noop_and_second_round(spark, warehouse):
    t = _build_table(spark, os.path.join(warehouse, "t"))
    idx = os.path.join(warehouse, "idx")
    ann_index.build_lake_ivf_index(t, idx, n_cells=4, iters=2)
    st = ann_index.refresh_lake_ivf_index(t, idx)
    assert st["fresh_rows"] == 0 and st["tomb_rows"] == 0

    # two refresh rounds; the second touches keys changed in the first
    t.merge_batch(_mk(spark, [("r0", "f000", c(2), 0, "upsert",
                               _vec(300))]), epoch=1)
    ann_index.refresh_lake_ivf_index(t, idx)
    t.merge_batch(_mk(spark, [("r0", "f000", c(3), 0, "upsert",
                               _vec(301)),
                              ("r9", "zz", c(3), 1, "upsert",
                               _vec(302))]), epoch=2)
    ann_index.refresh_lake_ivf_index(t, idx)
    for seed in (300, 301, 302, 5):
        qv = _vec(seed)
        assert _topk(t, idx, qv) == _brute(t, qv), seed
    # the twice-updated key resolves to its LATEST vector: querying with
    # that exact vector ranks it first with cosine 1.0
    top = _topk(t, idx, _vec(301), k=1)[0]
    assert (top[0], top[1], top[2]) == ("r0", "f000", 1.0)


def test_rebuild_resets_tombstones(spark, warehouse):
    t = _build_table(spark, os.path.join(warehouse, "t"))
    idx = os.path.join(warehouse, "idx")
    ann_index.build_lake_ivf_index(t, idx, n_cells=4, iters=2)
    t.merge_batch(_mk(spark, [("r0", "f000", c(2), 0, "delete", None)]),
                  epoch=1)
    st = ann_index.refresh_lake_ivf_index(t, idx)
    assert st["tomb_rows_total"] == 1
    ann_index.build_lake_ivf_index(t, idx, n_cells=4, iters=2)
    meta = ann_index._load_meta(idx)
    assert meta["tomb_rows"] == 0
    assert not os.path.isdir(os.path.join(idx, "_ivf_tomb"))
    qv = _vec(3)
    assert _topk(t, idx, qv) == _brute(t, qv)
