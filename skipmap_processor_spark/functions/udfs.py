"""Content normalization + sha256 digest — the per-row identity invariant.

Reference precedent: deterministic content-hash feature ids
(/root/reference/src/transforms/FeatureBuilder.ts:8-14) — row identity is a
pure function of normalized content, which is what makes upsert replay
idempotent.

Normalization contract (must match oracle.py exactly):
  1. unify line endings: CRLF and lone CR -> LF
  2. strip trailing spaces/tabs from every line (incl. the last)

Digest: lowercase-hex sha256 of the UTF-8 bytes of the normalized string.

Two implementations of normalization are provided and tested for equality:

- ``normalize_content_expr``: pure Spark built-in expressions. Stays inside
  whole-stage codegen on the JVM; zero Python. This is the fastest path.
- ``normalize_content_pandas``: an Arrow-vectorized ``pandas_udf`` using
  pandas' C-level ``.str`` kernels — zero per-row Python loops. This is the
  engine's default path per the BASELINE.json contract ("all per-row work in
  vectorized pandas/Arrow UDFs").

The sha256 digest itself always runs JVM-side via ``F.sha2`` (vectorized,
codegen) — there is no vectorized sha256 kernel in numpy/pandas/pyarrow, so a
pandas UDF digest would degrade to a per-row Python loop, which the contract
forbids.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


# --- Python reference implementation (oracle + tests) -----------------------

def normalize_py(content: str | None) -> str | None:
    if content is None:
        return None
    unified = content.replace("\r\n", "\n").replace("\r", "\n")
    return "\n".join(line.rstrip(" \t") for line in unified.split("\n"))


def sha256_py(content: str | None) -> str | None:
    """sha256(normalize(content)) — oracle-side twin of the Spark expression."""
    if content is None:
        return None
    return hashlib.sha256(normalize_py(content).encode("utf-8")).hexdigest()


# --- JVM expression implementation (codegen path) ----------------------------

def normalize_content_expr(col: Column) -> Column:
    """Normalization as built-in expressions (whole-stage codegen).

    Two regex passes, not four: any [ \\t]-run followed by a line ending
    (CRLF first in the ordered alternation, then lone CR, then LF) folds to
    LF in one scan, handling both line-ending unification and per-line
    trailing-blank strip; a second anchored pass strips end-of-string
    blanks. String scans are the membw-heavy part of the ingest hot path —
    halving them matters at high thread counts."""
    unified = F.regexp_replace(col, "[ \t]*\r\n|[ \t]*\r|[ \t]*\n", "\n")
    return F.regexp_replace(unified, "[ \t]+$", "")


def content_sha_expr(col: Column) -> Column:
    """sha256 hex digest of the normalized content (JVM-side, vectorized)."""
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.lower(F.sha2(normalize_content_expr(col), 256))
    )


# --- Arrow pandas_udf implementation (contract path) -------------------------

@pandas_udf(StringType())
def normalize_content_pandas(s: pd.Series) -> pd.Series:
    """Arrow-vectorized normalization: pandas .str kernels, no row loops.

    Same two-pass structure as the JVM expression. The anchored second
    pass is safe despite Python-re's $-before-final-newline quirk: pass
    one already removed every blank run preceding a newline, so $ can
    only bind blanks at the true end of string."""
    unified = s.str.replace(r"[ \t]*\r\n|[ \t]*\r|[ \t]*\n", "\n", regex=True)
    return unified.str.replace(r"[ \t]+$", "", regex=True)


def content_sha_via_pandas(col: Column) -> Column:
    """Default pipeline path: Arrow pandas_udf normalization + JVM sha2."""
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.lower(F.sha2(normalize_content_pandas(col), 256))
    )
