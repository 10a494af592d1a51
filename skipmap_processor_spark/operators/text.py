"""Text-analysis operators over a documents table (doc_id, text, lang, ...).

Everything here is pure JVM column expressions (whole-stage codegen; zero
Python), with a deterministic contract so a DuckDB oracle can compute the
same function. These are the large-scale training-data-pipeline ops layered
on the CDC engine (per-row formatter precedent in the reference:
/root/reference/src/transforms/RunFormatter.ts:29-96 — projection + derived
metrics as row-local functions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to"]


def tokens_expr(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def langid_expr(col: str = "text") -> Column:
    """n-gram/stopword heuristic language id: deterministic, oracle-matched."""
    tok = tokens_expr(col)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    ratio = F.expr(
        f"size(filter(split({col}, ' '), t -> t in ({stop_list}))) "
        f"/ cast(greatest(size(split({col}, ' ')), 1) as double)"
    )
    return (
        F.when(ratio >= 0.08, F.lit("en_like"))
        .when(ratio >= 0.02, F.lit("mixed"))
        .otherwise(F.lit("other"))
    )


def quality_metrics(df: DataFrame, col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / digit ratios + a quality score."""
    tok = tokens_expr(col)
    n_tok = F.greatest(F.size(tok), F.lit(1))
    n_chars = F.length(F.col(col))
    digit_ratio = F.round(
        F.length(F.regexp_replace(F.col(col), "[^0-9]", ""))
        / F.greatest(n_chars, F.lit(1)).cast("double"),
        6,
    )
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    stop_ratio = F.round(
        F.expr(f"size(filter(split({col}, ' '), t -> t in ({stop_list})))")
        / n_tok.cast("double"),
        6,
    )
    avg_tok_len = F.round(n_chars / n_tok.cast("double"), 6)
    score = F.round(
        F.least(n_tok / F.lit(64.0), F.lit(1.0)) * (F.lit(1.0) - digit_ratio),
        6,
    )
    return df.select(
        "doc_id",
        F.size(tok).cast("bigint").alias("n_tokens"),
        n_chars.cast("bigint").alias("n_chars"),
        avg_tok_len.alias("avg_token_len"),
        digit_ratio.alias("digit_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


# PII patterns kept to a regex dialect Java (Spark) and RE2-ish (DuckDB)
# both accept: explicit classes, no lookaround, no \w shorthand.
PII_PATTERNS = [
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"),
    ("hex_secret", "[0-9a-fA-F]{32,}"),
]


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-corpus PII scrub: emails, IPv4s, and long hex tokens
    (API-key shaped) replaced with a type tag; per-doc redaction count and
    the sha256 of the scrubbed text (so a pipeline can verify the scrub was
    applied before any content-hash dedup). Pure JVM regexp — one codegen
    stage, no shuffle."""
    redacted = F.col(text_col)
    n_hits = F.lit(0)
    for tag, pat in PII_PATTERNS:
        # Column function, NOT F.expr: the SQL parser would unescape '\.'
        # inside a string literal to '.', silently loosening the count regex.
        n_hits = n_hits + F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        redacted = F.regexp_replace(redacted, pat, f"[{tag.upper()}]")
    return df.select(
        "doc_id",
        n_hits.cast("bigint").alias("n_redactions"),
        F.lower(F.sha2(redacted, 256)).alias("redacted_sha"),
    )


def fingerprint_expr(col: str = "text") -> Column:
    """Document fingerprint: sha256 of normalized text, first 16 hex chars
    (content-hash identity precedent:
    /root/reference/src/transforms/FeatureBuilder.ts:8-14)."""
    from skipmap_processor_spark.functions.udfs import normalize_content_expr

    return F.substring(F.lower(F.sha2(normalize_content_expr(F.col(col)), 256)), 1, 16)
