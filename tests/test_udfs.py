"""Normalization + sha256: all three implementations must agree exactly."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from skipmap_processor_spark.functions.udfs import (
    content_sha_expr,
    content_sha_via_pandas,
    normalize_content_expr,
    normalize_content_pandas,
    normalize_py,
    sha256_py,
)

CASES = [
    "plain\nlines\nhere",
    "trailing spaces   \nand tabs\t\t\nmixed \t \n",
    "crlf\r\nline\r\nend\r\n",
    "lone\rcr\rhere",
    "mixed\r\nall \t\rthree\nkinds  ",
    "",
    "no newline at all",
    "unicode ✓ ümlaut λ  \n tab\tinside kept\t \n",
    "   leading spaces kept\nx",
]


def test_normalize_py_contract():
    assert normalize_py("a  \nb\t\n") == "a\nb\n"
    assert normalize_py("a  \nb\t") == "a\nb"
    assert normalize_py("a\r\nb\rc") == "a\nb\nc"
    assert normalize_py("tab\tin middle") == "tab\tin middle"
    assert normalize_py(None) is None
    assert sha256_py("x") == hashlib.sha256(b"x").hexdigest()


def test_three_normalizations_agree(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "content string")
    rows = df.select(
        "content",
        normalize_content_expr(F.col("content")).alias("n_expr"),
        normalize_content_pandas(F.col("content")).alias("n_pandas"),
        content_sha_expr(F.col("content")).alias("sha_expr"),
        content_sha_via_pandas(F.col("content")).alias("sha_pandas"),
    ).collect()
    for r in rows:
        expect_n = normalize_py(r["content"])
        expect_sha = sha256_py(r["content"])
        assert r["n_expr"] == expect_n, f"expr mismatch on {r['content']!r}"
        assert r["n_pandas"] == expect_n, f"pandas mismatch on {r['content']!r}"
        assert r["sha_expr"] == expect_sha
        assert r["sha_pandas"] == expect_sha


def test_null_content_sha(spark):
    df = spark.createDataFrame([(None,)], "content string")
    r = df.select(
        content_sha_expr(F.col("content")).alias("a"),
        content_sha_via_pandas(F.col("content")).alias("b"),
    ).first()
    assert r["a"] is None and r["b"] is None
