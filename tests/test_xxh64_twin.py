"""The driver-side xxhash64 twin must match Spark's expression exactly —
a divergence would silently mis-prune the changefeed's base scan."""
import random
import string

import pytest
from pyspark.sql import functions as F

from skipmap_processor_spark._xxh64 import (bucket_of,
                                            spark_xxhash64_strings, xxh64)


@pytest.fixture(scope="module")
def spark():
    from skipmap_processor_spark.session import get_spark

    s = get_spark(master="local[2]", shuffle_partitions=2,
                  driver_memory="2g", app_name="test-xxh64")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _corpus():
    rng = random.Random(20260822)
    alph = (string.ascii_letters + string.digits + "/._-:@ "
            + "éüßñ中日한\U0001F600\U0001F680")
    cases = [("", ""), ("a", ""), ("", "b"), (None, "x"), ("x", None),
             (None, None), ("repo-trickle", "src/t7.py")]
    # every length through the 8/4/1-byte tail boundaries and past the
    # 32-byte stripe threshold, plus long multi-stripe strings
    for n in list(range(0, 66)) + [100, 255, 1024]:
        cases.append((
            "".join(rng.choice(alph) for _ in range(n)),
            "".join(rng.choice(alph) for _ in range(rng.randint(0, 80))),
        ))
    return cases


def test_twin_matches_spark_exactly(spark):
    cases = _corpus()
    df = spark.createDataFrame(cases, "repo string, path string")
    rows = df.select(
        "repo", "path",
        F.xxhash64("repo", "path").alias("h"),
        F.pmod(F.xxhash64("repo", "path"), F.lit(1024)).alias("b1024"),
        F.pmod(F.xxhash64("repo", "path"), F.lit(32)).alias("b32"),
    ).collect()
    assert len(rows) == len(cases)
    for r in rows:
        assert spark_xxhash64_strings((r["repo"], r["path"])) == r["h"], (
            r["repo"], r["path"])
        if r["repo"] is not None and r["path"] is not None:
            assert bucket_of(r["repo"], r["path"], 1024) == r["b1024"]
            assert bucket_of(r["repo"], r["path"], 32) == r["b32"]


def test_single_column_and_seed_chain(spark):
    vals = ["", "x", "hello world", "a" * 31, "a" * 32, "a" * 33,
            "汉字テスト", None]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select("s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        assert spark_xxhash64_strings((r["s"],)) == r["h"]


def test_xxh64_reference_vector():
    # XXH64 published reference value (xxHash project): XXH64("", 0)
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
