"""Text analysis: token counting, quality scoring, language ID,
document fingerprinting. All pure Column expressions — scan-side,
codegen'd, zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.dataops.dedup import tokens_col

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
]

# a BPE-ish subword token proxy: runs of letters, runs of digits, or a
# single non-alnum non-space char each count as one token
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_bpe_tokens, avg_token_len)."""
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    n_bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0))
    total_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(total_len / F.greatest(n_tok, F.lit(1)), 6).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a composite score, length band,
    punctuation ratio, stopword ratio, repetition (distinct/total
    tokens) — the shape of a C4/Gopher-style quality filter, kept
    deterministic and engine-portable.

    The composite is emitted in FIXED POINT (micro-units, BIGINT
    ``quality_score_micro`` in [0, 1_000_000]): a float weighted sum
    can land on a decimal .5 tie where Spark's HALF_UP round and
    DuckDB/IEEE double rounding disagree by 1 ulp. All micro ratios
    are floor(num * 1e6 / den) — exact in binary doubles for any
    realistic doc length — and the /4 weights are powers of two, so
    every engine computes bit-identical integers."""
    t = F.col(text_col)
    toks = tokens_col(t)
    # materialize the expensive counters ONCE: each feeds both a ratio
    # and a micro column, and inlined they'd run twice per row (the
    # regexp_replace + the stopword filter + array_distinct dominate)
    feat = df.select(
        F.col(id_col),
        F.length(t).alias("__n__"),
        F.size(toks).alias("__ntok__"),
        F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", "")).alias("__punct__"),
        F.size(F.filter(toks, lambda x: F.lower(x).isin(EN_STOPWORDS))).alias(
            "__stop__"
        ),
        F.size(F.array_distinct(toks)).alias("__dist__"),
    )
    n = F.col("__n__")
    n_tok = F.col("__ntok__")
    punct = F.col("__punct__")
    stop_hits = F.col("__stop__")
    n_distinct = F.col("__dist__")
    mega = F.lit(1_000_000).cast("long")  # long: int*int would overflow at ~2k chars
    punct_micro = F.floor(punct * mega / F.greatest(n, F.lit(1)))
    stop_micro = F.floor(stop_hits * mega / F.greatest(n_tok, F.lit(1)))
    distinct_micro = F.floor(n_distinct * mega / F.greatest(n_tok, F.lit(1)))
    len_part = F.when((n >= 50) & (n <= 10000), F.lit(250_000)).otherwise(F.lit(0))
    punct_part = F.when(punct_micro <= 200_000, F.lit(250_000)).otherwise(F.lit(0))
    stop_part = F.floor(F.least(stop_micro * 10, F.lit(1_000_000)) / 4)
    distinct_part = F.floor(distinct_micro / 4)
    score_micro = (len_part + punct_part + stop_part + distinct_part).cast("long")
    return feat.select(
        F.col(id_col),
        F.round(punct / F.greatest(n, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(n_distinct / F.greatest(n_tok, F.lit(1)), 6).alias("distinct_ratio"),
        score_micro.alias("quality_score_micro"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram-free heuristic language ID: ascii-ratio gate + English
    stopword-hit ratio -> 'en' | 'unknown'. (A full fastText-style
    model is out of scope; the operator surface — per-doc label
    column usable as a filter key — is what matters.)"""
    t = F.col(text_col)
    ascii_ratio = F.length(F.regexp_replace(t, r"[^\x00-\x7F]", "")) / F.greatest(
        F.length(t), F.lit(1)
    )
    toks = tokens_col(t)
    stop_ratio = F.size(
        F.filter(toks, lambda x: F.lower(x).isin(EN_STOPWORDS))
    ) / F.greatest(F.size(toks), F.lit(1))
    pred = F.when((ascii_ratio >= 0.9) & (stop_ratio >= 0.03), F.lit("en")).otherwise(
        F.lit("unknown")
    )
    return df.select(F.col(id_col), pred.alias("lang_pred"))


# PII surface patterns — deliberately simple, engine-portable regexes
# (the operator contract is the per-doc flag columns; a production
# deployment swaps in its compliance team's pattern pack)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"(?:\+?[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"
SSN_RE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
IP_RE = r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}"


def pii_flags(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII indicators for training-data filtering: counts of
    email / phone / SSN-shaped / IP-shaped matches plus an aggregate
    ``has_pii`` flag. Pure scan-side expressions (one regexp pass per
    pattern); pairs with processor_desensitize for the redaction side
    of the same policy."""
    t = F.col(text_col)

    def n(pattern: str) -> Column:
        return F.size(F.regexp_extract_all(t, F.lit(pattern), 0))

    emails = n(EMAIL_RE)
    phones = n(PHONE_RE)
    ssns = n(SSN_RE)
    ips = n(IP_RE)
    return df.select(
        F.col(id_col),
        emails.alias("n_emails"),
        phones.alias("n_phones"),
        ssns.alias("n_ssns"),
        ips.alias("n_ips"),
        ((emails + phones + ssns + ips) > 0).cast("int").alias("has_pii"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical-form fingerprint (the classic key-collision method):
    md5 of the sorted distinct lowercase tokens. Word-order- and
    duplication-insensitive near-dup key; one expression, groupable."""
    toks = tokens_col(F.lower(F.col(text_col)))
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return df.select(F.col(id_col), F.md5(canon).alias("fingerprint"))
