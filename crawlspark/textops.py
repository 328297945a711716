"""Text-analysis operators for a large-scale training-data pipeline.

These extend the crawl engine's analytics tail with the operations a
100 TB web-text corpus pipeline needs (language-ID, quality scoring,
token counting, document fingerprinting). All are pure builtin-function
column expressions — JVM-side, whole-stage-codegen, no Python in the hot
path — so they scale linearly with executors.

Every operator is deterministic and has an exact ANSI-SQL twin (see
entry_queries.py oracles), so correctness is machine-checkable against
DuckDB on the same parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny stopword sets for the n-gram/stopword language heuristic
EN_STOP = ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"]


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (BPE-ish regex split). Exact SQL twin:
    DuckDB string_split(text, ' ')."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def avg_token_len(text: Column) -> Column:
    """Mean token length — a quality-score component. Computed as
    arithmetic over lengths (no UDF)."""
    t = tokens_col(text)
    return (F.length(F.concat_ws("", t)).cast("double") / F.size(t))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOP
    t = tokens_col(F.lower(text))
    hits = F.size(F.filter(t, lambda x: x.isin(*[F.lit(s) for s in sw])))
    return hits.cast("double") / F.size(t)


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\.,;:!\?]", "")
    return F.length(stripped).cast("double") / F.length(text)


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]-ish: favors mid-length docs with
    low punctuation density — the shape of heuristic web-text filters
    (C4/Gopher-style length+punct+stopword rules), fully deterministic."""
    n = token_count(text).cast("double")
    len_term = F.least(n / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 10.0, F.lit(1.0))
    return F.round(len_term * 0.6 + punct_term * 0.4, 4)


def lang_id(text: Column) -> Column:
    """Stopword-hit language heuristic: 'en' if the doc contains enough
    English stopwords, else 'und'. (A real n-gram model slots in here; the
    operator shape — pure column expr, no shuffle — is what matters.)"""
    ratio = stopword_ratio(text)
    return F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("und"))


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 over the
    whitespace-normalized lowercased text (rolling-hash analog; md5 is
    bit-identical across Spark and DuckDB so the oracle is exact)."""
    norm = F.lower(F.regexp_replace(text, r"\s+", " "))
    return F.md5(norm)


def shingles_col(text: Column, k: int = 3) -> Column:
    """Word k-gram shingles as an array column — built from sequence +
    transform (no UDF, no explode until the caller wants one)."""
    t = tokens_col(text)
    idx = F.sequence(F.lit(0), F.size(t) - k)
    return F.when(
        F.size(t) >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, k))),
    ).otherwise(F.array(F.concat_ws(" ", t)))


def profile(documents: DataFrame) -> DataFrame:
    """One-pass text profile of a documents table."""
    return documents.select(
        "doc_id",
        "lang",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(avg_token_len(F.col("text")), 4).alias("avg_token_len"),
        quality_score(F.col("text")).alias("quality"),
        lang_id(F.col("text")).alias("lang_pred"),
        doc_fingerprint(F.col("text")).alias("fingerprint"),
    )
